"""Named solve-key supersolves + wildfire incremental down-solve gating.

Reference parity: test/testSolveKey.jl (independent solutions under named
solveKeys) and the incremental recycling semantics of
CliqueStateMachine.jl:110-132 (UPRECYCLED skips the up-solve; the
wildfire down-gate is a TPU-side extension, off by default).
"""

import jax.numpy as jnp
import pytest

from incrementalinference.jl_tpu import initfg, solve_tree
from incrementalinference.jl_tpu.distributions import Normal
from incrementalinference.jl_tpu.graph import ContinuousScalar
from incrementalinference.jl_tpu.models import LinearRelative, Prior


def _chain(n, N=64, **params):
    fg = initfg()
    fg.params = fg.params.replace(N=N, **params)
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    for i in range(n):
        fg.add_variable(f"x{i+1}", ContinuousScalar)
        fg.add_factor([f"x{i}", f"x{i+1}"], LinearRelative(Normal(10.0, 1.0)))
    return fg


def _mean(fg, lbl, key="default"):
    return float(jnp.mean(fg.points(lbl, key)))


def test_named_solve_key_independent():
    """Solving under a named key must not disturb other keys and must land
    on the same posterior (reference testSolveKey.jl)."""
    fg = _chain(3)
    solve_tree(fg, solve_key="alt")
    for i in range(4):
        assert abs(_mean(fg, f"x{i}", "alt") - 10.0 * i) < 2.5
    # now solve default; alt must remain a valid standalone solution
    before = [_mean(fg, f"x{i}", "alt") for i in range(4)]
    solve_tree(fg)
    after = [_mean(fg, f"x{i}", "alt") for i in range(4)]
    assert before == after
    for i in range(4):
        assert abs(_mean(fg, f"x{i}", "default") - 10.0 * i) < 2.5


def _recycle_events(tree, needle):
    return [(tr.cid, d) for tr in tree.traces.values()
            for (_, s, d) in tr.events if s == "recycle" and needle in d]


def test_default_keeps_reference_down_semantics():
    """wildfire_tol=0 (default): recycled cliques skip only the up-solve —
    the down pass re-runs, exactly the reference's CSM behavior."""
    fg = _chain(6, incremental=True, record_cliques=True)
    tree = solve_tree(fg)
    fg.add_variable("x7", ContinuousScalar)
    fg.add_factor(["x6", "x7"], LinearRelative(Normal(10.0, 1.0)))
    tree2 = solve_tree(fg, old_tree=tree)
    assert len(_recycle_events(tree2, "up-solve")) > 0
    assert len(_recycle_events(tree2, "down-solve")) == 0


def test_wildfire_skips_unchanged_down_solves():
    """With wildfire_tol on, recycled cliques whose incoming down message
    is statistically unchanged skip the down pass; the posterior still
    matches ground truth."""
    fg = _chain(9, incremental=True, record_cliques=True, wildfire_tol=0.6)
    tree = solve_tree(fg)
    fg.add_variable("x10", ContinuousScalar)
    fg.add_factor(["x9", "x10"], LinearRelative(Normal(10.0, 1.0)))
    tree2 = solve_tree(fg, old_tree=tree)
    down_skips = _recycle_events(tree2, "down-solve")
    assert len(down_skips) >= 3
    for i in range(11):
        assert abs(_mean(fg, f"x{i}") - 10.0 * i) < 3.0


def test_wildfire_resolves_when_information_changes():
    """A new contradictory *prior* in the middle of the chain shifts every
    down message beyond tolerance — the wildfire gate must refuse to skip
    and must reproduce the ungated incremental solve exactly in structure."""
    fg = _chain(6, incremental=True, record_cliques=True, wildfire_tol=0.3)
    tree = solve_tree(fg)
    # contradictory prior yanks the whole chain upward
    fg.add_factor(["x3"], Prior(Normal(35.0, 0.5)))
    tree2 = solve_tree(fg, old_tree=tree)
    # messages changed everywhere → zero wildfire skips
    assert len(_recycle_events(tree2, "wildfire")) == 0
    # the new prior won at x3 (single-solve Gibbs moves the rest of the
    # chain gradually, exactly like the ungated/reference path)
    # the chain-implied x3 is 30; a single incremental solve moves it
    # partway toward the tight 35-prior (full convergence would take
    # repeated solves, matching the reference's per-solve Gibbs budget).
    # Bar: moved >= 1 sigma-equivalent off 30 and bounded by the prior.
    assert 31.0 < _mean(fg, "x3") < 37.0
    assert _mean(fg, "x6") > 55.0


def test_wildfire_auto_stays_off_below_crossover():
    """wildfire_tol="auto": below the measured crossover the gate resolves
    to 0.0 — exact reference down-solve semantics, zero statistic syncs
    (BASELINE "Wildfire gate: measured crossover")."""
    fg = _chain(6, incremental=True, record_cliques=True,
                wildfire_tol="auto")
    tree = solve_tree(fg)
    fg.add_variable("x7", ContinuousScalar)
    fg.add_factor(["x6", "x7"], LinearRelative(Normal(10.0, 1.0)))
    tree2 = solve_tree(fg, old_tree=tree)
    assert tree2.wildfire_stats["stat_syncs"] == 0
    assert tree2.wildfire_stats["wildfire_skips"] == 0
    assert len(_recycle_events(tree2, "down-solve")) == 0


def test_wildfire_auto_enables_past_crossover(monkeypatch):
    """Past the crossover the auto mode turns the gate on (threshold
    lowered for the test; the shipped value is the measured 64)."""
    import incrementalinference.jl_tpu.parallel.scheduler as sched

    monkeypatch.setattr(sched, "WILDFIRE_AUTO_MIN_RECYCLED", 5)
    fg = _chain(9, incremental=True, record_cliques=True,
                wildfire_tol="auto")
    tree = solve_tree(fg)
    fg.add_variable("x10", ContinuousScalar)
    fg.add_factor(["x9", "x10"], LinearRelative(Normal(10.0, 1.0)))
    tree2 = solve_tree(fg, old_tree=tree)
    # gate active: down-solves skipped via exact or statistic path
    skipped = (tree2.wildfire_stats["exact_skips"]
               + tree2.wildfire_stats["wildfire_skips"])
    assert skipped >= 3, tree2.wildfire_stats
    for i in range(11):
        assert abs(_mean(fg, f"x{i}") - 10.0 * i) < 3.0
