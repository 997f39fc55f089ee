"""Tree-init fixed point: down-init + re-up cycling (reference CSM
waitForUp/initUp/tryDownInit_ loop, CliqueStateMachine.jl:341-417, :699-858,
bounded by limittreeinit_iters :573-585; test territory:
testBasicTreeInit.jl / testTreeInitCycles).

The key scenario: a clique that can only initialize from its PARENT's down
pass must still get its subtree's information propagated back up — one
up+down sweep alone solves the rest of the tree WITHOUT that information.
"""

import numpy as np

from incrementalinference.jl_tpu import initfg, solve_tree
from incrementalinference.jl_tpu.canonical import generate_line_step
from incrementalinference.jl_tpu.distributions import Normal
from incrementalinference.jl_tpu.graph import ContinuousScalar
from incrementalinference.jl_tpu.models import LinearRelative, Prior
from incrementalinference.jl_tpu.tree.bayestree import CliqStatus


def _mean(fg, v):
    return float(np.asarray(fg.points(v)[:, 0]).mean())


def test_down_init_chain_prior_at_root():
    """Chain with its only prior at the tree ROOT: every non-root clique is
    NO_INIT on the up pass and must down-init; all statuses end exactly
    DOWNSOLVED and the posterior matches the hand-initialized solve."""
    fg = initfg()
    for i in range(4):
        fg.add_variable(f"x{i}", ContinuousScalar)
    # prior on the LAST variable, eliminated last -> root frontal
    fg.add_factor(["x3"], Prior(Normal(3.0, 0.1)), graphinit=False)
    for i in range(3):
        fg.add_factor([f"x{i}", f"x{i+1}"], LinearRelative(Normal(1.0, 0.1)),
                      graphinit=False)
    fg.params = fg.params.replace(graphinit=False)

    tree = solve_tree(fg, order=["x0", "x1", "x2", "x3"])

    for cl in tree.cliques.values():
        assert cl.status == CliqStatus.DOWNSOLVED, (cl.cid, cl.status)
    for i in range(4):
        assert fg.var(f"x{i}").is_initialized(), i
        # truth: x3=3, x2=2, x1=1, x0=0
        assert abs(_mean(fg, f"x{i}") - float(i)) < 0.35, (i, _mean(fg, f"x{i}"))


def test_reup_after_down_init_changes_posterior():
    """Loop graph where the down-initialized leaf clique holds constraint
    information (an inconsistent loop closure) that MUST flow back up:
    without the re-up pass, x1 solves to -1 (ignoring the loop); the exact
    least-squares posterior is x1=-5/3, x0=-10/3, x2=0."""
    fg = initfg()
    for i in range(3):
        fg.add_variable(f"x{i}", ContinuousScalar)
    fg.add_factor(["x2"], Prior(Normal(0.0, 0.1)), graphinit=False)
    fg.add_factor(["x1", "x2"], LinearRelative(Normal(1.0, 0.1)),
                  graphinit=False)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(1.0, 0.1)),
                  graphinit=False)
    # inconsistent loop closure: x2 - x0 = 4 (chain composition says 2)
    fg.add_factor(["x0", "x2"], LinearRelative(Normal(4.0, 0.1)),
                  graphinit=False)
    fg.params = fg.params.replace(graphinit=False)

    tree = solve_tree(fg, order=["x0", "x1", "x2"])

    for cl in tree.cliques.values():
        assert cl.status == CliqStatus.DOWNSOLVED, (cl.cid, cl.status)
    m1 = _mean(fg, "x1")
    m0 = _mean(fg, "x0")
    m2 = _mean(fg, "x2")
    # without the tree-init fixed point m1 stays at -1.0; with it the
    # posterior approaches the exact LS value -5/3.  Bars from an 8-seed
    # sweep of this statistic (mean -1.59, spread ±0.45 at N=100): 0.5
    # accepts the seed spread while cleanly rejecting the no-reup -1.0
    # (which the m1 < -1.15 check pins explicitly).
    assert abs(m1 - (-5.0 / 3.0)) < 0.5, m1
    assert m1 < -1.15, m1
    assert abs(m0 - (-10.0 / 3.0)) < 0.55, m0
    assert abs(m2 - 0.0) < 0.30, m2


def test_no_init_graph_does_not_fabricate():
    """A graph with no initializing information anywhere (relatives only)
    stays NO_INIT instead of solving from identity junk."""
    fg = initfg()
    for i in range(3):
        fg.add_variable(f"x{i}", ContinuousScalar)
    for i in range(2):
        fg.add_factor([f"x{i}", f"x{i+1}"], LinearRelative(Normal(1.0, 0.1)),
                      graphinit=False)
    fg.params = fg.params.replace(graphinit=False)

    tree = solve_tree(fg, order=["x0", "x1", "x2"])
    assert all(cl.status == CliqStatus.NO_INIT
               for cl in tree.cliques.values())
    for i in range(3):
        assert not fg.var(f"x{i}").is_initialized(), i


def test_fixed_point_noop_on_normal_graphs():
    """Graphs that init bottom-up take exactly one up+down pass (the fixed
    point must not add sweeps when nothing down-initializes)."""
    fg = generate_line_step(6, graphinit=False, pose_every=1,
                            landmark_every=7, pose_priors_at=(0,),
                            sight_distance=7)
    fg.params = fg.params.replace(record_cliques=True)
    tree = solve_tree(fg)
    for cl in tree.cliques.values():
        assert cl.status == CliqStatus.DOWNSOLVED
    for cid, tr in tree.traces.items():
        steps = [s for _, s, _ in tr.events]
        assert "re_up" not in steps, (cid, steps)
        assert steps.count("down_done") == 1, (cid, steps)
