"""Tree-level multihypothesis solves (reference testMultiHypo3Door.jl,
testMultimodal1D.jl, testnullhypothesis.jl)."""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, initfg, solve_tree)
from incrementalinference.jl_tpu.config import SolverParams


def _mass(fg, v, c, tol=3.0):
    p = np.asarray(fg.points(v)[:, 0])
    return float(np.mean(np.abs(p - c) < tol))


def test_three_door_multihypo_association():
    """Four known doors; a pose sees *a* door (quaternary multihypo) then
    odometry + a second sighting disambiguates (reference 3-door test
    structure, meas σ=0.25, odo σ=0.1)."""
    fg = initfg(SolverParams(N=200, gibbs_iters=5))
    doors = {"l0": 0.0, "l1": 10.0, "l2": 20.0, "l3": 40.0}
    for lbl, c in doors.items():
        fg.add_variable(lbl, ContinuousScalar)
        fg.add_factor([lbl], Prior(Normal(c, 0.01)))

    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0", "l0", "l1", "l2", "l3"],
                  LinearRelative(Normal(0.0, 0.25)),
                  multihypo=[1.0, 0.25, 0.25, 0.25, 0.25])
    solve_tree(fg)
    # x0 multimodal over all four doors
    masses = [_mass(fg, "x0", c) for c in doors.values()]
    assert sum(masses) > 0.75, masses
    assert sum(m > 0.08 for m in masses) >= 3, masses

    # drive +10 and see a door again: only (0→10) and (10→20) consistent
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 0.1)))
    fg.add_factor(["x1", "l0", "l1", "l2", "l3"],
                  LinearRelative(Normal(0.0, 0.25)),
                  multihypo=[1.0, 0.25, 0.25, 0.25, 0.25])
    solve_tree(fg)
    m_x1 = [_mass(fg, "x1", c, 3.0) for c in (10.0, 20.0)]
    assert sum(m_x1) > 0.6, m_x1
    bad = [_mass(fg, "x1", c, 3.0) for c in (0.0, 40.0, 30.0, 50.0)]
    assert sum(bad) < 0.25, bad
    # doors themselves stay pinned by their strong priors
    for lbl, c in doors.items():
        assert _mass(fg, lbl, c, 1.0) > 0.9, lbl


def test_nullhypo_through_tree():
    """A relative factor with nullhypo keeps extra spread but still pulls
    the posterior (reference testnullhypothesis.jl)."""
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a", "b"], LinearRelative(Normal(10.0, 1.0)),
                  nullhypo=0.2)
    solve_tree(fg)
    p = np.asarray(fg.points("b")[:, 0])
    # main mode at 10 with ≥60% of mass; spread beyond it allowed
    assert np.mean(np.abs(p - 10.0) < 5.0) > 0.6
    assert np.all(np.isfinite(p))


def test_multihypo_with_odometry_chain():
    """Multihypo association hanging off an odometry chain (reference
    testMultihypoAndChain.jl): chain poses stay unimodal; the ambiguous
    landmark sighting resolves against the two known landmarks."""
    fg = initfg(SolverParams(N=150))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.3)))
    for i in (1, 2):
        fg.add_variable(f"x{i}", ContinuousScalar)
        fg.add_factor([f"x{i-1}", f"x{i}"], LinearRelative(Normal(5.0, 0.3)))
    for lbl, c in (("la", 14.0), ("lb", 26.0)):
        fg.add_variable(lbl, ContinuousScalar)
        fg.add_factor([lbl], Prior(Normal(c, 0.1)))
    # from x2 (=10) we see a landmark 4 ahead: la (14) fits, lb (26) doesn't
    fg.add_factor(["x2", "la", "lb"], LinearRelative(Normal(4.0, 0.5)),
                  multihypo=[1.0, 0.5, 0.5])
    solve_tree(fg)
    for i, c in ((0, 0.0), (1, 5.0), (2, 10.0)):
        p = np.asarray(fg.points(f"x{i}")[:, 0])
        assert np.mean(np.abs(p - c) < 3.0) > 0.7, (i, p.mean())
    # landmarks stay pinned by their tight priors
    assert _mass(fg, "la", 14.0, 1.0) > 0.9
    assert _mass(fg, "lb", 26.0, 1.0) > 0.9


def test_csm_multihypo_runaway_427():
    """Issue #427 regression: uncertain 'ghost' landmark siblings
    (l1_0/l2_0 carry no priors) must not wedge the tree-init/solve loop
    (reference TestCSMMultihypo.jl — asserts completion; we also check the
    certain landmarks and poses land where the priors say)."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)
    from incrementalinference.jl_tpu.ops.convolve import approx_conv_belief

    fg = initfg(SolverParams(N=100, limit_iters=30))
    fg.add_variable("l1", ContinuousScalar)
    fg.add_factor(["l1"], Prior(Normal(50.0, 0.1)))
    fg.add_variable("l2", ContinuousScalar)
    fg.add_factor(["l2"], Prior(Normal(-50.0, 0.1)))
    fg.add_variable("l1_0", ContinuousScalar)
    fg.add_variable("l2_0", ContinuousScalar)
    fg.add_variable("x1", ContinuousScalar)
    f1 = fg.add_factor(["x1", "l1", "l1_0"],
                       LinearRelative(Normal(40.0, 0.25)),
                       multihypo=[1.0, 0.5, 0.5])
    fg.add_variable("x2", ContinuousScalar)
    fg.add_factor(["x1", "x2"], LinearRelative(Normal(0.0, 0.1)))
    fg.add_factor(["x2", "l2", "l2_0"],
                  LinearRelative(Normal(-40.0, 0.25)),
                  multihypo=[1.0, 0.5, 0.5])

    # conv through the multihypo factor both directions (reference :62-63)
    approx_conv_belief(fg, f1.label, "l1_0")
    approx_conv_belief(fg, f1.label, "x1")

    solve_tree(fg)
    l1 = float(np.mean(np.asarray(fg.points("l1")[:, 0])))
    assert abs(l1 - 50.0) < 1.0, l1
    x1 = np.asarray(fg.points("x1")[:, 0])
    # x1 = l1 - 40 = 10 under the certain-landmark hypothesis; the ghost
    # hypothesis keeps a secondary mode, so check dominant mass
    assert np.mean(np.abs(x1 - 10.0) < 5.0) > 0.3, x1.mean()


def test_null_surplus_sibling_boost():
    """nullSurplus (#1517): relative non-multihypo siblings of a multihypo
    factor propose with nullhypo >= params.null_surplus_add (reference
    proposalbeliefs!, ApproxConv.jl:253-265 + EvalFactor.jl:352); priors
    and the multihypo factor itself are NOT boosted, and variables with no
    multihypo factor see no boost at all."""
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg)
    from incrementalinference.jl_tpu.ops.convolve import null_surplus_map
    from incrementalinference.jl_tpu.ops.graphops import prepare_update

    fg = initfg(SolverParams(N=50))
    for lbl, c in (("la", 0.0), ("lb", 20.0)):
        fg.add_variable(lbl, ContinuousScalar)
        fg.add_factor([lbl], Prior(Normal(c, 0.1)))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 5.0)))
    fg.add_variable("x1", ContinuousScalar)
    fodo = fg.add_factor(["x0", "x1"], LinearRelative(Normal(2.0, 0.2)))
    fmh = fg.add_factor(["x1", "la", "lb"],
                        LinearRelative(Normal(0.0, 0.5)),
                        multihypo=[1.0, 0.5, 0.5])

    # proposal target shared by the multihypo factor and the odometry
    plan = prepare_update(fg, "x1", fg.factors_of("x1"))
    factors = [fg.factor(l) for l in fg.factors_of("x1")]
    nsrp = null_surplus_map(fg.params, factors)
    assert nsrp[fodo.label] == fg.params.null_surplus_add == 0.3
    assert nsrp[fmh.label] == 0.0
    # the sibling odometry spec carries the boosted nullhypo
    assert any(s.multihypo is None and abs(s.nullhypo - 0.3) < 1e-9
               for s in plan.specs), [(s.multihypo, s.nullhypo)
                                      for s in plan.specs]
    # the multihypo factor itself is unboosted
    assert any(s.multihypo is not None and s.nullhypo == 0.0
               for s in plan.specs)

    # at a target with no multihypo factor there is no boost
    factors_x0 = [fg.factor(l) for l in fg.factors_of("x0")]
    nsrp0 = null_surplus_map(fg.params, factors_x0)
    assert all(v == 0.0 for v in nsrp0.values())
    plan0 = prepare_update(fg, "x0", fg.factors_of("x0"))
    assert all(s.nullhypo == 0.0 for s in plan0.specs)


def test_null_surplus_preserves_ambiguity_end_to_end():
    """#1517 regression shape: an overconfident unimodal sibling (odometry)
    must not squash the multihypo association's alternative mode — with
    nullSurplus the posterior keeps visible mass at both consistent doors."""
    import numpy as np

    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)

    fg = initfg(SolverParams(N=200, gibbs_iters=5))
    for lbl, c in (("la", 0.0), ("lb", 10.0)):
        fg.add_variable(lbl, ContinuousScalar)
        fg.add_factor([lbl], Prior(Normal(c, 0.05)))
    fg.add_variable("x0", ContinuousScalar)
    # weak prior biased toward la's hypothesis
    fg.add_factor(["x0"], Prior(Normal(0.0, 2.0)))
    fg.add_variable("x1", ContinuousScalar)
    # tight odometry: the sibling that squashes ambiguity without #1517
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(0.0, 0.1)))
    # ambiguous sighting: x1 is at la or lb
    fg.add_factor(["x1", "la", "lb"], LinearRelative(Normal(0.0, 0.3)),
                  multihypo=[1.0, 0.5, 0.5])
    solve_tree(fg)
    p = np.asarray(fg.points("x1")[:, 0])
    m_a = float(np.mean(np.abs(p - 0.0) < 2.0))
    m_b = float(np.mean(np.abs(p - 10.0) < 2.0))
    # dominant mode at la (prior pulls there), but lb's mode survives
    assert m_a > 0.3, (m_a, m_b)
    assert m_a + m_b > 0.7, (m_a, m_b)
    assert np.all(np.isfinite(p))
