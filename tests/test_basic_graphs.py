"""Trivial-graph behavior bars (reference testBasicGraphs.jl): posterior
mean/variance windows on prior-only and small chain graphs, solved-count
bookkeeping, solvable demotion, reset-to-init, MetaPrior pass-through."""

import numpy as np
import pytest

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         MetaPrior, Normal, Prior,
                                         SolverParams, incr_suffix, init_all,
                                         initfg, local_product, solve_tree)
from incrementalinference.jl_tpu.canonical import generate_kaess
from incrementalinference.jl_tpu.graphinit import (ensure_solvable,
                                                   reset_initial_values)
from incrementalinference.jl_tpu.parametric import solve_graph_parametric


def _mean_var(fg, lbl):
    p = np.asarray(fg.points(lbl)[:, 0])
    return float(p.mean()), float(p.var(ddof=1))


def test_incr_suffix():
    # reference testBasicGraphs.jl:11-15
    assert incr_suffix("x45_4") == "x45_5"
    assert incr_suffix("x45", 3) == "x48"
    assert incr_suffix("x45_4", -1) == "x45_3"


def test_single_prior_solved_count_and_moments():
    """One variable, one prior (reference testBasicGraphs.jl:19-56)."""
    fg = initfg(SolverParams(N=100))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))

    v = fg.var("x0")
    assert v.get_solved_count() == 0 and not v.is_solved()

    solve_tree(fg)
    assert v.get_solved_count() == 1 and v.is_solved()
    solve_tree(fg)
    assert v.get_solved_count() == 2

    m, var = _mean_var(fg, "x0")
    assert abs(m) < 0.5                      # reference :44
    assert 0.3 < var < 1.9                   # reference :47

    # factor-less solvable variable is demoted before the solve (:50-54)
    fg.add_variable("x1", ContinuousScalar, solvable=1)
    solve_tree(fg, store_old=True)
    assert fg.var("x1").solvable == 0


def test_prior_offset_1000():
    fg = initfg(SolverParams(N=100))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(1000.0, 1.0)))
    solve_tree(fg)
    m, var = _mean_var(fg, "x0")
    assert abs(m - 1000.0) < 0.5             # reference :69
    assert 0.4 < var < 1.8                   # reference :72


@pytest.mark.parametrize("nprior,lo,hi", [(2, 0.3, 1.0), (3, 0.1, 0.75)])
def test_repeated_identical_priors_tighten(nprior, lo, hi):
    """k identical priors shrink the posterior variance toward 1/k
    (reference testBasicGraphs.jl:77-115)."""
    fg = initfg(SolverParams(N=100))
    fg.add_variable("x0", ContinuousScalar)
    for _ in range(nprior):
        fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    solve_tree(fg)
    m, var = _mean_var(fg, "x0")
    assert abs(m) < 0.4
    assert lo < var < hi, var


def test_opposing_priors_average():
    """Priors at ±1 → mean 0, var ≈ 1/2 (reference :119-136) — and the
    same offset by -1000 (:139-156)."""
    for off in (0.0, -1000.0):
        fg = initfg(SolverParams(N=100))
        fg.add_variable("x0", ContinuousScalar)
        fg.add_factor(["x0"], Prior(Normal(-1.0 + off, 1.0)))
        fg.add_factor(["x0"], Prior(Normal(+1.0 + off, 1.0)))
        solve_tree(fg)
        m, var = _mean_var(fg, "x0")
        assert abs(m - off) < 0.8, (off, m)
        assert 0.2 < var < 1.5, var


def test_two_priors_weak_connection():
    """Identical priors + weak relative keep both near 0 with ~unit
    variance (reference :160-183); separated priors with a weak link stay
    near their own prior (:186-210)."""
    fg = initfg(SolverParams(N=100))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    fg.add_factor(["x1"], Prior(Normal(0.0, 1.0)))
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(0.0, 10.0)))
    solve_tree(fg)
    for lbl in ("x0", "x1"):
        m, var = _mean_var(fg, lbl)
        assert abs(m) < 0.6, (lbl, m)
        assert 0.3 < var < 2.4, (lbl, var)

    fg = initfg(SolverParams(N=100))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(-1.0, 1.0)))
    fg.add_factor(["x1"], Prior(Normal(+1.0, 1.0)))
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(0.0, 10.0)))
    solve_tree(fg)
    m0, v0 = _mean_var(fg, "x0")
    m1, v1 = _mean_var(fg, "x1")
    assert abs(m0 + 1.0) < 0.75 and abs(m1 - 1.0) < 0.75, (m0, m1)
    assert 0.3 < v0 < 2.5 and 0.3 < v1 < 2.5


def test_five_variable_chain_ordered_means():
    """Separated ±3 priors over a 5-chain: means stay strictly ordered and
    roughly antisymmetric (reference testBasicGraphs.jl:250-307)."""
    fg = initfg(SolverParams(N=100))
    for i in range(5):
        fg.add_variable(f"x{i}", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(-3.0, 1.0)))
    fg.add_factor(["x4"], Prior(Normal(+3.0, 1.0)))
    for i in range(4):
        fg.add_factor([f"x{i}", f"x{i+1}"], LinearRelative(Normal(0.0, 1.0)))
    solve_tree(fg, store_old=True)

    means = [_mean_var(fg, f"x{i}")[0] for i in range(5)]
    assert all(a < b for a, b in zip(means, means[1:])), means  # :283
    assert abs(means[0] + means[4]) < 2.2
    assert abs(means[1] + means[3]) < 2.2
    assert abs(means[2]) < 2.2
    for i in range(5):
        var = _mean_var(fg, f"x{i}")[1]
        assert 0.2 < var < 3.2, (i, var)

    # localProduct on the default and the graphinit solveKeys (:311-316)
    local_product(fg, "x2")
    local_product(fg, "x2", solve_key="graphinit")


def test_reset_initial_values_roundtrip():
    """Solve moves points away from graphinit; resetInitialValues! restores
    them exactly (reference testBasicGraphs.jl:364-396)."""
    fg = initfg(SolverParams(N=100))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(1000.0, 1.0)))
    init_all(fg)
    x_init = np.asarray(fg.points("x0")).copy()

    solve_tree(fg)
    x_solved = np.asarray(fg.points("x0"))
    assert np.linalg.norm(x_init - x_solved) > 1e-10

    reset_initial_values(fg)
    x_reset = np.asarray(fg.points("x0"))
    assert np.linalg.norm(x_init - x_reset) < 1e-10


def test_metaprior_passthrough_both_algorithms():
    """MetaPrior adds data without influencing either solver (reference
    testBasicGraphs.jl:399-408)."""
    fg = generate_kaess(graphinit=True)
    fg.add_factor(["x1"], MetaPrior({"note": "calibration blob"}))
    solve_tree(fg)
    solve_graph_parametric(fg)
    assert fg.var("x1").is_solved()


def test_ensure_solvable_demotes_only_orphans():
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
    demoted = ensure_solvable(fg)
    assert demoted == ["b"]
    assert fg.var("a").solvable == 1 and fg.var("b").solvable == 0


def test_late_landmark_repromotion():
    """A variable declared before its first factor is auto-demoted by
    ensure_solvable; once a sighting arrives the next solve must re-promote
    and estimate it (real SLAM pattern: landmark declared ahead of time).
    Regression: the stale demotion used to leave the landmark out of the
    elimination order while its new factor dragged it into separators
    (KeyError in build_tree)."""
    import numpy as np
    from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                             Normal, Prior, initfg,
                                             solve_tree)
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0., 1.)))
    fg.add_variable("l1", ContinuousScalar)
    for i in (1, 2, 3):
        fg.add_variable(f"x{i}", ContinuousScalar)
        fg.add_factor([f"x{i-1}", f"x{i}"], LinearRelative(Normal(1., .5)))
    tree = solve_tree(fg)
    assert fg.var("l1").solvable == 0
    fg.add_factor(["x3", "l1"], LinearRelative(Normal(5.0, 0.5)))
    solve_tree(fg, old_tree=tree)
    assert fg.var("l1").solvable == 1
    assert abs(float(np.asarray(fg.points("l1")).mean()) - 8.0) < 2.0
