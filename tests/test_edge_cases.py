"""Edge-case parity: orphaned variables, disconnected components, empty
graphs, repeated solves (reference testSolveOrphanedFG.jl and friends)."""

import numpy as np
import pytest

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, initfg, solve_tree)


def test_orphaned_variable_no_factors():
    """A variable with no factors must not break the solve; it stays
    uninitialized at identity (reference orphaned-graph handling)."""
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(5.0, 1.0)))
    fg.add_variable("orphan", ContinuousScalar)
    tree = solve_tree(fg)
    assert abs(float(np.asarray(fg.points("a")).mean()) - 5.0) < 1.0
    assert not fg.var("orphan").is_initialized()
    assert np.all(np.asarray(fg.points("orphan")) == 0.0)


def test_disconnected_components_solve_independently():
    fg = initfg()
    for comp, base in (("a", 0.0), ("b", 100.0)):
        fg.add_variable(f"{comp}0", ContinuousScalar)
        fg.add_factor([f"{comp}0"], Prior(Normal(base, 0.5)))
        fg.add_variable(f"{comp}1", ContinuousScalar)
        fg.add_factor([f"{comp}0", f"{comp}1"],
                      LinearRelative(Normal(10.0, 0.5)))
    tree = solve_tree(fg)
    assert len(tree.root_ids) == 2            # forest
    assert abs(float(np.asarray(fg.points("a1")).mean()) - 10.0) < 2.0
    assert abs(float(np.asarray(fg.points("b1")).mean()) - 110.0) < 2.0


def test_empty_graph_is_graceful_noop():
    fg = initfg()
    tree = solve_tree(fg)
    assert tree.num_cliques() == 0


def test_single_variable_graph():
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(-3.0, 0.5)))
    tree = solve_tree(fg)
    assert tree.num_cliques() == 1
    assert abs(float(np.asarray(fg.points("a")).mean()) + 3.0) < 1.0


def test_repeated_solves_stay_consistent():
    """Solving an unchanged graph repeatedly must not drift (stationarity
    of the Gibbs/product fixed point)."""
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a", "b"], LinearRelative(Normal(10.0, 1.0)))
    tree = None
    means = []
    for _ in range(4):
        tree = solve_tree(fg, old_tree=tree)
        means.append(float(np.asarray(fg.points("b")).mean()))
    assert all(abs(m - 10.0) < 2.0 for m in means), means


def test_factor_arity_mismatch_errors():
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    with pytest.raises(ValueError):
        fg.add_factor(["a"], Prior(Normal(0, 1)), multihypo=[1.0, 0.5])


def test_graph_without_priors_manual_anchor():
    """Relative-only graphs have gauge freedom (reference testHasPriors913):
    nothing auto-inits until an anchor is supplied; manual init of one
    variable lets the rest chain."""
    from incrementalinference.jl_tpu.graphinit import init_variable
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a", "b"], LinearRelative(Normal(10.0, 0.5)))
    assert not fg.var("a").is_initialized()
    assert not fg.var("b").is_initialized()
    # anchor a by hand; the solve (incl. init cycles) completes
    init_variable(fg, "a", Normal(0.0, 0.5))
    solve_tree(fg)
    assert fg.var("b").is_initialized()
    assert abs(float(np.asarray(fg.points("b")).mean()) - 10.0) < 2.0


def test_mixed_particle_counts():
    """Variables with different N solve together (reference
    testVariousNSolveSize): convolutions tile to the max count."""
    fg = initfg()
    fg.add_variable("a", ContinuousScalar, N=60)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
    fg.add_variable("b", ContinuousScalar, N=100)
    fg.add_factor(["a", "b"], LinearRelative(Normal(10.0, 1.0)))
    fg.add_variable("c", ContinuousScalar, N=40)
    fg.add_factor(["b", "c"], LinearRelative(Normal(10.0, 1.0)))
    solve_tree(fg)
    assert fg.points("a").shape[0] == 60
    assert fg.points("b").shape[0] == 100
    assert fg.points("c").shape[0] == 40
    assert abs(float(np.asarray(fg.points("c")).mean()) - 20.0) < 3.0
