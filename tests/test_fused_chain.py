"""Whole-clique fused Gibbs chain (ops/fused.py:_fused_chain_fn).

The chain is the TPU default (SolverParams.fuse_clique="auto"); these tests
force it on under the CPU backend and assert it reproduces the sequential
path's statistics on the structures that exercise its branches: plain
chains, multihypo + nullhypo, and the scan over Gibbs rounds.
"""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import initfg, solve_tree
from incrementalinference.jl_tpu.config import SolverParams
from incrementalinference.jl_tpu.distributions import Normal
from incrementalinference.jl_tpu.graph import ContinuousScalar
from incrementalinference.jl_tpu.models import LinearRelative, Prior


def test_chain_matches_sequential_on_linestep():
    from incrementalinference.jl_tpu.canonical import generate_line_step

    fg = generate_line_step(12, graphinit=True)
    fg.params = fg.params.replace(fuse_clique=True, batch_cliques=False)
    solve_tree(fg)
    for i in range(0, 13, 2):
        assert abs(float(jnp.mean(fg.points(f"x{i}"))) - i) < 1.5, i


def test_chain_multihypo_odometry():
    # the reference testMultihypoAndChain scenario, forced onto the chain
    # kernel (multihypo + nullhypo specs inside the fused schedule)
    fg = initfg(SolverParams(N=150, fuse_clique=True, batch_cliques=False))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.3)))
    for i in (1, 2):
        fg.add_variable(f"x{i}", ContinuousScalar)
        fg.add_factor([f"x{i-1}", f"x{i}"], LinearRelative(Normal(5.0, 0.3)))
    for lbl, c in (("la", 14.0), ("lb", 26.0)):
        fg.add_variable(lbl, ContinuousScalar)
        fg.add_factor([lbl], Prior(Normal(c, 0.1)))
    fg.add_factor(["x2", "la", "lb"], LinearRelative(Normal(4.0, 0.5)),
                  multihypo=[1.0, 0.5, 0.5])
    solve_tree(fg)
    for i, c in ((0, 0.0), (1, 5.0), (2, 10.0)):
        p = np.asarray(fg.points(f"x{i}")[:, 0])
        assert np.mean(np.abs(p - c) < 3.0) > 0.7, (i, p.mean())
    la = np.asarray(fg.points("la")[:, 0])
    assert np.mean(np.abs(la - 14.0) < 1.0) > 0.9


def test_chain_falls_back_on_mixed_particle_counts():
    # mixed N inside one clique → the chain builder returns False and the
    # sequential path must still produce the right posterior
    fg = initfg(SolverParams(N=64, fuse_clique=True, batch_cliques=False))
    fg.add_variable("x0", ContinuousScalar, N=64)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    fg.add_variable("x1", ContinuousScalar, N=96)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 1.0)))
    solve_tree(fg)
    assert abs(float(jnp.mean(fg.points("x1"))) - 10.0) < 2.5
    assert fg.points("x1").shape[0] == 96


def test_fused_segment_matches_per_clique():
    """EXPERIMENTAL whole-segment fusion (fuse_sweep=True): a chain of
    cliques solved in one dispatch yields the same posterior statistics as
    the per-clique path (inter-clique messages substituted in-trace)."""
    import numpy as np

    from incrementalinference.jl_tpu import SolverParams, solve_tree
    from incrementalinference.jl_tpu.canonical import generate_line_step
    import incrementalinference.jl_tpu.parallel.scheduler as sched

    calls = {"seg": 0}
    orig = sched.up_solve_segment

    def counting(*a, **k):
        calls["seg"] += 1
        return orig(*a, **k)

    sched.up_solve_segment = counting
    try:
        fg = generate_line_step(8, graphinit=True,
                                params=SolverParams(N=75, fuse_sweep=True,
                                                    fuse_clique=True))
        solve_tree(fg)
    finally:
        sched.up_solve_segment = orig
    assert calls["seg"] >= 1, "segment fusion did not engage"
    for lbl in sorted(fg.ls()):
        truth = float(lbl.lstrip("xlm"))
        m = float(np.mean(np.asarray(fg.points(lbl)[:, 0])))
        assert abs(m - truth) < 0.5, (lbl, m)


def test_precompile_seeds_chain_plans():
    """precompile_updates builds the fused whole-clique chain programs too
    (the production TPU cold path); the subsequent solve reuses the seeded
    plans and matches ground truth."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.parallel.precompile import \
        precompile_updates
    from incrementalinference.jl_tpu.tree.bayestree import build_tree

    fg = initfg(SolverParams(N=80, fuse_clique=True, batch_cliques=False))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)))
    for i in range(4):
        fg.add_variable(f"x{i+1}", ContinuousScalar)
        fg.add_factor([f"x{i}", f"x{i+1}"], LinearRelative(Normal(5.0, 0.5)))
    tree = build_tree(fg)
    n = precompile_updates(fg, tree)
    assert n > 0
    solve_tree(fg)
    for i in range(5):
        m = float(np.asarray(fg.points(f"x{i}")[:, 0]).mean())
        assert abs(m - 5.0 * i) < 2.0, (i, m)


def test_precompile_shard_partitions_jobs():
    """precompile_updates(shard=(i,k)) splits the deterministic job list:
    the shards are disjoint and cover all jobs (the unit of work of the
    process farm)."""
    from incrementalinference.jl_tpu.canonical import generate_line_step
    from incrementalinference.jl_tpu.parallel.precompile import (
        precompile_updates)
    from incrementalinference.jl_tpu.tree.bayestree import build_tree

    fg = generate_line_step(8, graphinit=True)
    tree = build_tree(fg)
    total = precompile_updates(fg, tree)
    parts = [precompile_updates(fg, tree, shard=(i, 3)) for i in range(3)]
    assert sum(parts) == total > 0
