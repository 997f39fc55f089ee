"""Round-5 width-aware multi-device policy tests (split from
test_multichip.py: each sharded-suite child must stay under the XLA:CPU
per-process code-volume abort — see tests/conftest.py)."""

import sys

import jax  # noqa: F401
import numpy as np

sys.path.insert(0, "/root/repo")


def test_particle_sharded_narrow_chain_parity():
    """Round-5 width-aware policy (VERDICT r4 item #3): a chain-shaped
    graph (levels of width 1-2, the canonical incremental SLAM shape) with
    distribute="auto" particle-shards each clique's fused chain across the
    mesh and must reproduce the unsharded posterior statistics."""
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg, solve_tree)
    from incrementalinference.jl_tpu.config import SolverParams
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    def build():
        fg = initfg(SolverParams(N=64))
        prev = None
        for i in range(10):
            v = f"x{i}"
            fg.add_variable(v, ContinuousScalar)
            if prev is None:
                fg.add_factor([v], Prior(Normal(0.0, 0.5)))
            else:
                fg.add_factor([prev, v],
                              LinearRelative(Normal(3.0, 0.5)))
            prev = v
        return fg

    fg_ref = build()
    solve_tree(fg_ref)
    fg_sh = build()
    tree = solve_tree(fg_sh, mesh=make_mesh(8), distribute="auto")
    assert tree is not None
    for i in range(10):
        a = float(np.asarray(fg_ref.points(f"x{i}"))[:, 0].mean())
        b = float(np.asarray(fg_sh.points(f"x{i}"))[:, 0].mean())
        assert abs(a - 3.0 * i) < 1.0, (i, a)
        assert abs(b - 3.0 * i) < 1.0, (i, b)
        assert abs(a - b) < 1.0, (i, a, b)


def test_auto_distribute_mixed_width_graph():
    """distribute="auto" on a graph with BOTH a wide forest level (clique
    batching+sharding) and narrow chain levels (particle sharding)."""
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg, solve_tree)
    from incrementalinference.jl_tpu.config import SolverParams
    from incrementalinference.jl_tpu.parallel.mesh import make_mesh

    fg = initfg(SolverParams(N=32, batch_cliques="auto", batch_min_width=4))
    # wide star: 8 leaf branches off a root chain
    fg.add_variable("r0", ContinuousScalar)
    fg.add_factor(["r0"], Prior(Normal(0.0, 0.5)))
    fg.add_variable("r1", ContinuousScalar)
    fg.add_factor(["r0", "r1"], LinearRelative(Normal(1.0, 0.5)))
    for b in range(8):
        v = f"b{b}"
        fg.add_variable(v, ContinuousScalar)
        fg.add_factor(["r1", v], LinearRelative(Normal(float(b), 0.5)))
    tree = solve_tree(fg, mesh=make_mesh(8), distribute="auto")
    assert tree is not None
    for b in range(8):
        m = float(np.asarray(fg.points(f"b{b}"))[:, 0].mean())
        assert abs(m - (1.0 + b)) < 1.0, (b, m)
