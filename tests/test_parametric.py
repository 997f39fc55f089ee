"""Parametric solver tests (reference testBasicParametric.jl,
testMixtureParametric.jl analogues)."""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Mixture, Normal, Prior, initfg)
from incrementalinference.jl_tpu.canonical import generate_line_step
from incrementalinference.jl_tpu.parametric import (
    autoinit_parametric, solve_conditionals_parametric,
    solve_graph_parametric)


def test_line_step_exact():
    fg = generate_line_step(10, graphinit=False)
    res = solve_graph_parametric(fg)
    for v in fg.ls():
        truth = float(v[1:] if v[0] == "x" else v[2:])
        est = float(np.asarray(fg.var(v).parametric_point)[0])
        assert abs(est - truth) < 1e-3, (v, est, truth)
        cov = float(np.asarray(fg.var(v).parametric_cov)[0, 0])
        assert np.isfinite(cov) and cov > 0.0
    assert res["_cost"] < 1e-6


def test_covariance_grows_along_chain():
    """Odometry-only chain: marginal variance increases with distance from
    the prior."""
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.1)), graphinit=False)
    prev = "x0"
    for i in range(1, 5):
        fg.add_variable(f"x{i}", ContinuousScalar)
        fg.add_factor([prev, f"x{i}"], LinearRelative(Normal(1.0, 0.5)),
                      graphinit=False)
        prev = f"x{i}"
    solve_graph_parametric(fg)
    covs = [float(np.asarray(fg.var(f"x{i}").parametric_cov)[0, 0])
            for i in range(5)]
    assert all(covs[i] < covs[i + 1] for i in range(4)), covs


def test_conditionals_pin_separators():
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)), graphinit=False)
    fg.add_factor(["a", "b"], LinearRelative(Normal(10.0, 1.0)),
                  graphinit=False)
    fg.var("a").parametric_point = jnp.asarray([100.0])   # pinned away
    solve_conditionals_parametric(fg, ["b"], ["a"])
    b = float(np.asarray(fg.var("b").parametric_point)[0])
    assert abs(b - 110.0) < 1e-2, b
    # the pinned separator must not move
    assert float(np.asarray(fg.var("a").parametric_point)[0]) == 100.0


def test_max_mixture_picks_nearest_mode():
    fg = initfg()
    fg.add_variable("x", ContinuousScalar)
    mix = Mixture(Prior, [Normal(-50.0, 2.0), Normal(50.0, 2.0)], [0.5, 0.5])
    fg.add_factor(["x"], mix, graphinit=False)
    fg.add_factor(["x"], Prior(Normal(40.0, 10.0)), graphinit=False)
    # max-mixture is non-convex: init in the prior's basin (the reference
    # likewise relies on graphinit/autoinit for component selection)
    fg.var("x").parametric_point = jnp.asarray([40.0])
    solve_graph_parametric(fg)
    x = float(np.asarray(fg.var("x").parametric_point)[0])
    assert abs(x - 50.0) < 5.0, x       # near mode wins, not the mean 0


def test_autoinit_parametric_chain():
    fg = generate_line_step(6, graphinit=False)
    autoinit_parametric(fg)
    for v in fg.ls():
        pt = fg.var(v).parametric_point
        assert pt is not None
        truth = float(v[1:] if v[0] == "x" else v[2:])
        assert abs(float(np.asarray(pt)[0]) - truth) < 0.5, v


def test_parametric_tree_solve_matches_batch():
    """Clique-wise parametric sweeps agree with the full batch solve
    (reference ParametricCSM vs solveGraphParametric)."""
    from incrementalinference.jl_tpu import solve_tree
    fg = generate_line_step(10, graphinit=False)
    tree = solve_tree(fg, algorithm="parametric")
    from incrementalinference.jl_tpu.tree.bayestree import CliqStatus
    assert all(c.status == CliqStatus.DOWNSOLVED
               for c in tree.cliques.values())
    for v in fg.ls():
        truth = float(v[1:] if v[0] == "x" else v[2:])
        est = float(np.asarray(fg.var(v).parametric_point)[0])
        assert abs(est - truth) < 0.05, (v, est, truth)
        cov = float(np.asarray(fg.var(v).parametric_cov)[0, 0])
        assert np.isfinite(cov) and cov > 0


def test_covariance_consistent_with_particle_spread():
    """On a linear-Gaussian chain the two stacks must agree: nonparametric
    particle std ≈ parametric marginal std (cross-validation of the
    solvers against each other)."""
    from incrementalinference.jl_tpu import solve_tree
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    for i in range(1, 4):
        fg.add_variable(f"x{i}", ContinuousScalar)
        fg.add_factor([f"x{i-1}", f"x{i}"], LinearRelative(Normal(2.0, 1.0)))
    solve_tree(fg)
    solve_graph_parametric(fg)
    for i in range(4):
        p_std = float(np.asarray(fg.points(f"x{i}")[:, 0]).std())
        q_std = float(np.sqrt(np.asarray(
            fg.var(f"x{i}").parametric_cov)[0, 0]))
        assert 0.4 * q_std < p_std < 2.5 * q_std, (i, p_std, q_std)
        p_mean = float(np.asarray(fg.points(f"x{i}")[:, 0]).mean())
        q_mean = float(np.asarray(fg.var(f"x{i}").parametric_point)[0])
        assert abs(p_mean - q_mean) < 3.0 * max(q_std, 0.5), (i, p_mean,
                                                              q_mean)


def test_batched_wide_forest_tree_solve():
    """Wide forest: same-level cliques share structure, so the parametric
    tree solve batches them into one vmapped LM kernel — results must
    match the per-branch ground truth exactly."""
    from incrementalinference.jl_tpu import solve_tree
    fg = initfg()
    for b in range(8):
        fg.add_variable(f"b{b}x0", ContinuousScalar)
        fg.add_factor([f"b{b}x0"], Prior(Normal(float(b), 0.5)),
                      graphinit=False)
        fg.add_variable(f"b{b}x1", ContinuousScalar)
        fg.add_factor([f"b{b}x0", f"b{b}x1"],
                      LinearRelative(Normal(1.0, 0.5)), graphinit=False)
    solve_tree(fg, algorithm="parametric")
    for b in range(8):
        e0 = float(np.asarray(fg.var(f"b{b}x0").parametric_point)[0])
        e1 = float(np.asarray(fg.var(f"b{b}x1").parametric_point)[0])
        assert abs(e0 - b) < 1e-3 and abs(e1 - (b + 1)) < 1e-3, (b, e0, e1)
        cov = float(np.asarray(fg.var(f"b{b}x1").parametric_cov)[0, 0])
        assert np.isfinite(cov) and cov > 0


def test_solve_problems_batched_matches_sequential():
    """solve_problems_batched == per-problem ParametricProblem.solve."""
    from incrementalinference.jl_tpu.parametric.solver import (
        ParametricProblem, solve_problems_batched)
    fgs = []
    for b in range(5):
        fg = initfg()
        fg.add_variable("x0", ContinuousScalar)
        fg.add_factor(["x0"], Prior(Normal(float(b), 0.3)), graphinit=False)
        fg.add_variable("x1", ContinuousScalar)
        fg.add_factor(["x0", "x1"], LinearRelative(Normal(2.0, 0.4)),
                      graphinit=False)
        fgs.append(fg)
    probs = [ParametricProblem(fg) for fg in fgs]
    batched = solve_problems_batched(probs)
    seq = [ParametricProblem(fg).solve() for fg in fgs]
    for (bp, bc, _), (sp, sc, _) in zip(batched, seq):
        for pb, ps in zip(bp, sp):
            np.testing.assert_allclose(np.asarray(pb), np.asarray(ps),
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(bc), np.asarray(sc),
                                   atol=1e-6)


def test_parametric_max_multihypo_association():
    """Max-multihypo in the parametric solver: an ambiguous sighting
    associates with the best-fitting candidate and leaves the other
    untouched (goes beyond the reference, whose parametric MaxMultihypo is
    commented-out WIP — src/services/MaxMixture.jl)."""
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)), graphinit=False)
    for lbl, mu in (("l1", 10.0), ("l2", 50.0)):
        fg.add_variable(lbl, ContinuousScalar)
        fg.add_factor([lbl], Prior(Normal(mu, 1.0)), graphinit=False)
    fg.add_factor(["x0", "l1", "l2"], LinearRelative(Normal(10.0, 1.0)),
                  multihypo=[1.0, 0.5, 0.5], graphinit=False)
    solve_graph_parametric(fg)
    x0 = float(np.asarray(fg.var("x0").parametric_point)[0])
    l1 = float(np.asarray(fg.var("l1").parametric_point)[0])
    l2 = float(np.asarray(fg.var("l2").parametric_point)[0])
    assert abs(x0) < 0.6 and abs(l1 - 10) < 1.0 and abs(l2 - 50) < 1.0


def test_parametric_max_nullhypo_outlier_gate():
    """nullhypo in the parametric solver gates outlier factors: when the
    whitened residual is less likely than the null alternative the factor
    contributes nothing that LM iteration (reference MaxNullhypo is WIP)."""
    def build(nullhypo):
        fg = initfg()
        fg.add_variable("x0", ContinuousScalar)
        fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)), graphinit=False)
        for i in (1, 2):
            fg.add_variable(f"x{i}", ContinuousScalar)
            fg.add_factor([f"x{i-1}", f"x{i}"],
                          LinearRelative(Normal(10.0, 0.5)), graphinit=False)
        kw = {"nullhypo": nullhypo} if nullhypo else {}
        fg.add_factor(["x0", "x2"], LinearRelative(Normal(70.0, 0.5)),
                      graphinit=False, **kw)
        return fg

    fg = build(0.2)
    solve_graph_parametric(fg)
    x2 = float(np.asarray(fg.var("x2").parametric_point)[0])
    assert abs(x2 - 20.0) < 1.0, x2          # outlier gated out

    fg2 = build(0.0)
    solve_graph_parametric(fg2)
    x2_drag = float(np.asarray(fg2.var("x2").parametric_point)[0])
    assert x2_drag > 25.0, x2_drag           # ungated outlier drags


def test_parametric_tree_recycling_incremental():
    """Incremental parametric re-solve reuses the Gaussian up messages of
    untouched subtrees (the parametric analogue of UPRECYCLED clique
    recycling): grown-graph solve skips recycled cliques' LM and still
    matches a from-scratch solve exactly."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.tree.bayestree import CliqStatus

    def chain(n, params):
        fg = initfg(params)
        fg.add_variable("x0", ContinuousScalar)
        fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)), graphinit=False)
        for i in range(n):
            fg.add_variable(f"x{i+1}", ContinuousScalar)
            fg.add_factor([f"x{i}", f"x{i+1}"],
                          LinearRelative(Normal(1.0, 0.1)), graphinit=False)
        return fg

    params = SolverParams(incremental=True, graphinit=False)
    fg = chain(8, params)
    tree = solve_tree(fg, algorithm="parametric")
    assert tree.param_up_msgs
    # grow by one pose and re-solve with the old tree
    fg.add_variable("x9", ContinuousScalar)
    fg.add_factor(["x8", "x9"], LinearRelative(Normal(1.0, 0.1)),
                  graphinit=False)
    tree2 = solve_tree(fg, algorithm="parametric", old_tree=tree)
    recycled = [cl for cl in tree2.cliques.values() if cl.is_recycled]
    assert len(recycled) >= 3, len(recycled)
    # recycled cliques ended DOWNSOLVED and their messages were reused
    assert all(cl.status == CliqStatus.DOWNSOLVED
               for cl in tree2.cliques.values())
    # exactness: matches a from-scratch solve of the same graph
    fg2 = chain(9, params)
    solve_tree(fg2, algorithm="parametric")
    for v in fg.ls():
        a = np.asarray(fg.var(v).parametric_point)
        b = np.asarray(fg2.var(v).parametric_point)
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_init_parametric_from_beliefs():
    """initParametricFrom! parity (ParametricUtils.jl:866-889): the
    parametric solution seeds from another solve key's particle clouds —
    on-manifold means + sample covariances — and the parametric tree solve
    uses those seeds instead of conditional autoinit."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg, solve_tree)
    from incrementalinference.jl_tpu.parametric import init_parametric_from

    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(5.0, 0.5)))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 0.5)))

    n = init_parametric_from(fg)
    assert n == 2
    for v, truth in (("x0", 5.0), ("x1", 15.0)):
        mu = float(np.asarray(fg.var(v).parametric_point)[0])
        bel_mean = float(np.asarray(fg.points(v)[:, 0]).mean())
        assert abs(mu - bel_mean) < 1e-5
        assert abs(mu - truth) < 2.0
        cov = np.asarray(fg.var(v).parametric_cov)
        assert np.all(np.isfinite(cov)) and cov[0, 0] > 0
    # only_missing keeps existing points
    import jax.numpy as jnp
    fg.var("x0").parametric_point = jnp.asarray([99.0])
    assert init_parametric_from(fg, only_missing=True) == 0

    # the parametric tree solve runs off belief seeds and lands exactly
    fg.var("x0").parametric_point = None
    solve_tree(fg, algorithm="parametric")
    assert abs(float(np.asarray(fg.var("x1").parametric_point)[0])
               - 15.0) < 0.2


def test_batched_grouping_keys_on_real_layout():
    """Two problems whose PADDED buckets and leaf shapes coincide but whose
    real-variable counts differ must not merge into one batch group: the
    group's layout plans (input p0 bucketing, output row unstack) come
    from one representative, so a merge assembles the other problem from
    the wrong layout (review finding, solver.py solve_problems_batched).

    Construction: 5-var vs 6-var chains, both with a prior on EVERY
    variable and the 5-var chain given a duplicate relative so both
    factor groups pad to bucket 6 — identical treedefs and leaf shapes,
    different real layouts."""
    from incrementalinference.jl_tpu.parametric.solver import (
        ParametricProblem, solve_problems_batched)

    def chain(n, extra_rel=False):
        fg = initfg()
        for i in range(n):
            fg.add_variable(f"x{i}", ContinuousScalar)
            fg.add_factor([f"x{i}"], Prior(Normal(float(10 * i), 1.0)),
                          graphinit=False)
            if i:
                fg.add_factor([f"x{i-1}", f"x{i}"],
                              LinearRelative(Normal(10.0, 1.0)),
                              graphinit=False)
        if extra_rel:
            fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 1.0)),
                          graphinit=False)
        return fg

    pa = ParametricProblem(chain(5, extra_rel=True))   # 5 vars, 5 rels
    pb = ParametricProblem(chain(6))                   # 6 vars, 5 rels
    # the collision premise: padded shapes match, real layouts differ
    import jax.tree_util as jtu
    sa, ta = jtu.tree_flatten(pa)
    sb, tb = jtu.tree_flatten(pb)
    assert ta == tb
    assert [jnp.shape(l) for l in sa] == [jnp.shape(l) for l in sb]
    assert pa._real_layout() != pb._real_layout()

    res = solve_problems_batched([pa, pb])
    pts_a, _, _ = res[0]
    pts_b, _, _ = res[1]
    assert len(pts_a) == 5 and len(pts_b) == 6
    for i in range(5):
        assert abs(float(jnp.ravel(pts_a[i])[0]) - 10.0 * i) < 0.5
    for i in range(6):
        assert abs(float(jnp.ravel(pts_b[i])[0]) - 10.0 * i) < 0.5
    assert len(pa.p0) == 5 and len(pb.p0) == 6


def test_cg_solver_matches_dense():
    """Matrix-free LM (solver="cg": jvp/vjp CG on the normal equations,
    no dense J/H — the reference's sparse-Jacobian role,
    ParametricManopt.jl:153-231) must reproduce the dense solve."""
    import numpy as np

    from incrementalinference.jl_tpu.canonical import generate_line_step
    from incrementalinference.jl_tpu.parametric.solver import (
        solve_graph_parametric)

    fg_d = generate_line_step(60, graphinit=False)
    solve_graph_parametric(fg_d)
    fg_c = generate_line_step(60, graphinit=False)
    solve_graph_parametric(fg_c, solver="cg", compute_cov=False)
    for v in fg_d.ls():
        a = np.asarray(fg_d.var(v).parametric_point)
        b = np.asarray(fg_c.var(v).parametric_point)
        assert np.allclose(a, b, atol=1e-2), (v, a, b)
        # exactness vs ground truth too (pose id == position)
        i = int(v[1:]) if v.startswith("x") else int(v[2:])
        assert abs(float(b.ravel()[0]) - i) < 1e-2, (v, b)
