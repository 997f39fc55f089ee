"""Single-clique solve harness + tree-init stopping criteria (reference
testCliqSolveDbgUtils.jl, testBasicTreeInit.jl)."""

import numpy as np

from incrementalinference.jl_tpu import (SolverParams, build_tree, init_all,
                                         solve_cliq_down, solve_cliq_up,
                                         solve_tree)
from incrementalinference.jl_tpu.canonical import (generate_caesar_ring1d,
                                                   generate_line_step)
from incrementalinference.jl_tpu.tree.bayestree import CliqStatus


def test_solve_cliq_up_down_harness():
    """Hand-driven single-clique up + down solves on a LineStep(8) chain
    (reference testCliqSolveDbgUtils.jl:6-45)."""
    N = 8
    fg = generate_line_step(N, graphinit=False, pose_every=1,
                            landmark_every=N + 1, pose_priors_at=(0,),
                            sight_distance=N + 1)
    init_all(fg)
    tree = build_tree(fg)

    # pick a leaf clique and up-solve it in isolation: the graph is fully
    # initialized, so the up-solve MUST succeed (exact status — NO_INIT
    # here would mean the init path regressed)
    leaf = next(c for c in tree.cliques.values() if not c.children)
    msg = solve_cliq_up(fg, tree, leaf.frontals[0])
    assert msg.status == CliqStatus.UPSOLVED
    assert set(msg.beliefs) <= set(leaf.separator)
    assert leaf.status == CliqStatus.UPSOLVED

    # root down-solve with the leaf's message hand-fed
    root = tree.clique(tree.root_ids[0])
    out = solve_cliq_down(fg, tree, root.frontals[0], child_msgs=[msg])
    assert isinstance(out, dict)
    assert root.status == CliqStatus.DOWNSOLVED
    for ch_cid, dmsg in out.items():
        assert dmsg.direction == "down"
        assert set(dmsg.beliefs) <= set(tree.clique(ch_cid).separator) | \
            set(tree.clique(ch_cid).frontals)


def test_treeinit_caesar_ring():
    """CaesarRing1D with graphinit=False solves purely via tree-init
    (reference testBasicTreeInit.jl:50-60)."""
    fg = generate_caesar_ring1d()
    fg.params = fg.params.replace(graphinit=False)
    solve_tree(fg)
    for v in fg.ls():
        assert fg.var(v).is_initialized(), v
    # ring closes: x0 pinned at 0 by its prior
    p0 = np.asarray(fg.points("x0")[:, 0])
    assert abs(p0.mean()) < 1.0


def test_clique_traces_recorded():
    """recordcliqs-style traces capture per-clique step history during a
    solve (reference testBasicTreeInit.jl history-length checks)."""
    fg = generate_line_step(1, params=SolverParams(record_cliques=True,
                                                   logpath="/tmp/iitpu-test-logs"))
    tree = solve_tree(fg)
    assert tree.traces
    for cid, tr in tree.traces.items():
        steps = [s for _, s, _ in tr.events]
        assert "up_done" in steps or "recycle" in steps, (cid, steps)


def test_harness_auto_builds_messages():
    """child_msgs=None / down_msg=None auto-build messages from the
    graph's current beliefs (reference _buildMessagesUp/_buildMessageDown,
    SolverAPI.jl:506-521, :617-632)."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg, solve_cliq_down,
                                             solve_cliq_up)
    from incrementalinference.jl_tpu.graphinit import init_all
    from incrementalinference.jl_tpu.tree.bayestree import (CliqStatus,
                                                            build_tree)

    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)))
    for i in range(3):
        fg.add_variable(f"x{i+1}", ContinuousScalar)
        fg.add_factor([f"x{i}", f"x{i+1}"], LinearRelative(Normal(5.0, 0.5)))
    init_all(fg)
    tree = build_tree(fg)

    root = tree.clique(tree.root_ids[0])
    # up-solve the root WITHOUT hand-fed messages: children's up messages
    # derive from the graphinit beliefs
    msg = solve_cliq_up(fg, tree, root.frontals[0])
    assert msg.status == CliqStatus.UPSOLVED
    # down-solve a non-root clique WITHOUT a hand-fed parent message
    leaf = next(c for c in tree.cliques.values() if c.parent is not None)
    out = solve_cliq_down(fg, tree, leaf.frontals[0])
    assert isinstance(out, dict)
    assert leaf.status == CliqStatus.DOWNSOLVED
    for v in leaf.frontals:
        m = float(np.asarray(fg.points(v)[:, 0]).mean())
        truth = 5.0 * int(v[1:])
        assert abs(m - truth) < 3.0, (v, m)
