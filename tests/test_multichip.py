"""Multi-device sharding tests on the virtual 8-device CPU mesh
(the reference's testMultiprocess.jl role, SURVEY.md §2.9.2 → mesh)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (128, 2)
    assert bool(jnp.all(jnp.isfinite(out[0])))


def test_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_parametric_matches_single_device():
    """Factor-sharded normal equations == single-device result."""
    from incrementalinference.jl_tpu.canonical import generate_line_step
    from incrementalinference.jl_tpu.parametric.solver import ParametricProblem
    from incrementalinference.jl_tpu.parallel.mesh import (
        make_mesh, shard_group_arrays, sharded_normal_equations)

    fg = generate_line_step(8, graphinit=False)
    prob = ParametricProblem(fg)
    x = jnp.zeros((prob.total_dof,))
    r = prob.residuals(x)
    J = jax.jacfwd(prob.residuals)(x)
    H_ref, g_ref = J.T @ J, J.T @ r

    fg2 = generate_line_step(8, graphinit=False)
    prob2 = ParametricProblem(fg2)
    mesh = make_mesh(8)
    for g in prob2.groups:
        shard_group_arrays(mesh, g)
    H, gv = sharded_normal_equations(mesh, prob2.residuals, x)
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_sharded_tree_solve_end_to_end():
    """Full nonparametric tree solve with particle arrays sharded over the
    8-device mesh — same statistics as the single-device solve."""
    import numpy as np
    from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                             Mixture, Normal, Prior, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.config import SolverParams
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    fg = initfg(SolverParams(N=128))
    door = Mixture(Prior, [Normal(-100, 3), Normal(0, 3), Normal(100, 3),
                           Normal(300, 3)])
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x1"], door)
    fg.add_variable("x2", ContinuousScalar)
    fg.add_factor(["x1", "x2"], LinearRelative(Normal(50.0, 2.0)))
    fg.add_variable("x3", ContinuousScalar)
    fg.add_factor(["x2", "x3"], LinearRelative(Normal(50.0, 4.0)))
    fg.add_factor(["x3"], door)

    mesh = make_mesh(8)
    solve_tree(fg, mesh=mesh)
    p1 = np.asarray(fg.points("x1")[:, 0])
    m = np.mean(np.abs(p1 + 100) < 20) + np.mean(np.abs(p1 - 0) < 20)
    assert m > 0.7, m
    p3 = np.asarray(fg.points("x3")[:, 0])
    m3 = np.mean(np.abs(p3 - 0) < 20) + np.mean(np.abs(p3 - 100) < 20)
    assert m3 > 0.7, m3


def test_sharded_solve_wide_graph_no_abort():
    """Particle-sharded solve of a wide graph: clique batching must yield
    to the mesh path (eager stacking of sharded arrays aborts XLA:CPU)."""
    import numpy as np
    from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                             Normal, Prior, initfg, solve_tree)
    from incrementalinference.jl_tpu.config import SolverParams
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    fg = initfg(SolverParams(N=128, batch_cliques="auto", batch_min_width=2))
    for b in range(6):
        fg.add_variable(f"b{b}x0", ContinuousScalar)
        fg.add_factor([f"b{b}x0"], Prior(Normal(float(b), 0.5)))
        fg.add_variable(f"b{b}x1", ContinuousScalar)
        fg.add_factor([f"b{b}x0", f"b{b}x1"],
                      LinearRelative(Normal(1.0, 0.5)))
    solve_tree(fg, mesh=make_mesh(8))
    for b in range(6):
        m = float(np.asarray(fg.points(f"b{b}x1")).mean())
        assert abs(m - (b + 1)) < 1.5, (b, m)


def test_mesh_sharded_parametric_tree_solve():
    """Level-batched parametric clique solves with the batch axis sharded
    over the 8-device mesh (the reference's WorkerPool clique distribution,
    CliqStateMachineUtils.jl:349-410) — exact single-device results."""
    import numpy as np
    from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                             Normal, Prior, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    fg = initfg()
    for b in range(16):
        fg.add_variable(f"b{b}x0", ContinuousScalar)
        fg.add_factor([f"b{b}x0"], Prior(Normal(float(b), 0.5)),
                      graphinit=False)
        fg.add_variable(f"b{b}x1", ContinuousScalar)
        fg.add_factor([f"b{b}x0", f"b{b}x1"],
                      LinearRelative(Normal(1.0, 0.5)), graphinit=False)
    solve_tree(fg, algorithm="parametric", mesh=make_mesh(8))
    for b in range(16):
        e1 = float(np.asarray(fg.var(f"b{b}x1").parametric_point)[0])
        assert abs(e1 - (b + 1)) < 1e-3, (b, e1)
        cov = float(np.asarray(fg.var(f"b{b}x1").parametric_cov)[0, 0])
        assert np.isfinite(cov) and cov > 0


def test_clique_sharded_incremental_recycling():
    """Incremental re-solve with old_tree= under distribute="cliques":
    recycled cliques skip their up-solves on the sharded path too, and the
    grown chain stays accurate (VERDICT r2 item 6 — the hard paths must be
    exercised sharded, not only fresh solves)."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    fg = initfg(SolverParams(batch_cliques=True, batch_min_width=2, N=64))
    fg.add_variable("r0", ContinuousScalar)
    fg.add_factor(["r0"], Prior(Normal(0.0, 0.5)))
    for i in range(1, 5):
        fg.add_variable(f"r{i}", ContinuousScalar)
        fg.add_factor([f"r{i-1}", f"r{i}"], LinearRelative(Normal(1.0, 0.5)))
    tree = solve_tree(fg, mesh=mesh, distribute="cliques", order=fg.ls())
    for i in range(5, 7):
        fg.add_variable(f"r{i}", ContinuousScalar)
        fg.add_factor([f"r{i-1}", f"r{i}"], LinearRelative(Normal(1.0, 0.5)))
    tree2 = solve_tree(fg, old_tree=tree, mesh=mesh, distribute="cliques",
                       order=fg.ls())
    assert sum(c.is_recycled for c in tree2.cliques.values()) >= 2
    # bar derivation mirrors __graft_entry__.dryrun_multichip: chain-end
    # posterior sigma_6 = 0.5*sqrt(7) ~= 1.32, N=64 mean s.e. ~= 0.165,
    # bar = 4 s.e. ~= 0.66
    for i in range(7):
        m = float(np.asarray(fg.points(f"r{i}")[:, 0]).mean())
        assert abs(m - i) < 0.66, (i, m)


def test_clique_sharded_multihypo():
    """Multihypo data association (HypoRecipe masks + nullSurplus) under
    the sharded clique path — association must concentrate on the
    prior-consistent door."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    fg = initfg(SolverParams(batch_cliques=True, batch_min_width=2, N=64))
    for d, pos in (("d0", 0.0), ("d1", 8.0)):
        fg.add_variable(d, ContinuousScalar)
        fg.add_factor([d], Prior(Normal(pos, 0.3)))
    fg.add_variable("mx", ContinuousScalar)
    fg.add_factor(["mx", "d0", "d1"], LinearRelative(Normal(0.0, 0.3)),
                  multihypo=[1.0, 0.5, 0.5])
    fg.add_factor(["mx"], Prior(Normal(0.0, 1.0)))
    solve_tree(fg, mesh=make_mesh(8), distribute="cliques")
    pm = np.asarray(fg.points("mx")[:, 0])
    assert float(np.mean(np.abs(pm - 0.0) < 2.0)) > 0.6, pm.mean()


def test_clique_sharded_batched_level_solve():
    """distribute="cliques" with batch_cliques: wide levels stack into one
    vmapped kernel whose clique axis shards across the mesh (the
    reference's WorkerPool clique distribution as a GSPMD batch axis,
    CliqStateMachineUtils.jl:349-410)."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    fg = initfg(SolverParams(batch_cliques=True, batch_min_width=4))
    for b in range(12):          # 12 branches: pads to 16 on 8 devices
        fg.add_variable(f"b{b}x0", ContinuousScalar)
        fg.add_factor([f"b{b}x0"], Prior(Normal(float(b), 0.5)))
        fg.add_variable(f"b{b}x1", ContinuousScalar)
        fg.add_factor([f"b{b}x0", f"b{b}x1"],
                      LinearRelative(Normal(1.0, 0.5)))
    solve_tree(fg, mesh=make_mesh(8), distribute="cliques")
    for b in range(12):
        m = float(np.mean(np.asarray(fg.points(f"b{b}x1")[:, 0])))
        assert abs(m - (b + 1.0)) < 1.0, (b, m)
