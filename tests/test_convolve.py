"""Convolution-engine tests (reference testCommonConvWrapper.jl /
testApproxConv.jl / testBasicForwardConvolve.jl analogues).  Statistical
assertions use the reference's tolerance-window idiom
(test/testMultithreaded.jl:33-38)."""

import jax
import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousEuclid, ContinuousScalar,
                                         EuclidDistance, LinearRelative,
                                         MvNormal, Normal, Prior, initfg)
from incrementalinference.jl_tpu.ops.convolve import eval_factor


def _fg_pair(z=Normal(10.0, 1.0)):
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
    fg.add_factor(["a", "b"], LinearRelative(z), graphinit=False)
    return fg


def test_forward_convolve():
    fg = _fg_pair()
    pts, mask = eval_factor(fg, "ab" + "f2", "b")
    p = np.asarray(pts[:, 0])
    # ≥95% of particles within a generous window around 10 (ref idiom)
    assert np.mean(np.abs(p - 10.0) < 6.0) >= 0.95
    assert bool(mask.all())


def test_backward_convolve():
    fg = _fg_pair()
    from incrementalinference.jl_tpu.graphinit import init_variable
    init_variable(fg, "b", Normal(10.0, 0.5))
    pts, _ = eval_factor(fg, "abf2", "a")
    p = np.asarray(pts[:, 0])
    assert np.mean(np.abs(p - 0.0) < 6.0) >= 0.9


def test_nullhypo_fraction_spreads():
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
    from incrementalinference.jl_tpu.graphinit import init_variable
    init_variable(fg, "b", Normal(50.0, 1.0))
    f = fg.add_factor(["a", "b"], LinearRelative(Normal(10.0, 1.0)),
                      nullhypo=0.5, graphinit=False)
    pts, _ = eval_factor(fg, f.label, "b")
    p = np.asarray(pts[:, 0])
    frac_solved = np.mean(np.abs(p - 10.0) < 6.0)
    # roughly half solve to 10; the rest stay spread near old values
    assert 0.25 < frac_solved < 0.75, frac_solved


def test_multihypo_solve_certain():
    """Certain var solves against per-particle selected hypothesis."""
    fg = initfg()
    fg.add_variable("x", ContinuousScalar)
    fg.add_variable("la", ContinuousScalar)
    fg.add_variable("lb", ContinuousScalar)
    from incrementalinference.jl_tpu.graphinit import init_variable
    init_variable(fg, "la", Normal(100.0, 1.0))
    init_variable(fg, "lb", Normal(-100.0, 1.0))
    f = fg.add_factor(["x", "la", "lb"], LinearRelative(Normal(10.0, 1.0)),
                      multihypo=[1.0, 0.5, 0.5], graphinit=False)
    pts, _ = eval_factor(fg, f.label, "x")
    p = np.asarray(pts[:, 0])
    near_a = np.mean(np.abs(p - 90.0) < 8.0)     # la - 10
    near_b = np.mean(np.abs(p + 110.0) < 8.0)    # lb - 10
    assert near_a > 0.25 and near_b > 0.25, (near_a, near_b)
    assert near_a + near_b > 0.85


def test_multihypo_solve_uncertain():
    """Solving an uncertain var: ~its fraction solves, rest spreads."""
    fg = initfg()
    fg.add_variable("x", ContinuousScalar)
    fg.add_variable("la", ContinuousScalar)
    fg.add_variable("lb", ContinuousScalar)
    from incrementalinference.jl_tpu.graphinit import init_variable
    init_variable(fg, "x", Normal(0.0, 1.0))
    init_variable(fg, "la", Normal(500.0, 1.0))
    init_variable(fg, "lb", Normal(-500.0, 1.0))
    f = fg.add_factor(["x", "la", "lb"], LinearRelative(Normal(10.0, 1.0)),
                      multihypo=[1.0, 0.5, 0.5], graphinit=False)
    pts, _ = eval_factor(fg, f.label, "la")
    p = np.asarray(pts[:, 0])
    frac_solved = np.mean(np.abs(p - 10.0) < 8.0)
    assert 0.25 < frac_solved < 0.8, frac_solved


def test_euclid_distance_ring():
    fg = initfg()
    fg.add_variable("x", ContinuousEuclid(2))
    fg.add_variable("l", ContinuousEuclid(2))
    fg.add_factor(["x"], Prior(MvNormal([0.0, 0.0], [1.0, 1.0])))
    f = fg.add_factor(["x", "l"], EuclidDistance(Normal(100.0, 1.0)),
                      graphinit=False)
    pts, _ = eval_factor(fg, f.label, "l")
    r = np.linalg.norm(np.asarray(pts), axis=1)
    assert np.mean(np.abs(r - 100.0) < 6.0) >= 0.9
    ang = np.arctan2(np.asarray(pts)[:, 1], np.asarray(pts)[:, 0])
    assert np.std(ang) > 0.5          # spread around the ring


def test_prior_proposal_matches_distribution():
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    f = fg.add_factor(["a"], Prior(Normal(5.0, 2.0)), graphinit=False)
    pts, _ = eval_factor(fg, f.label, "a")
    p = np.asarray(pts[:, 0])
    assert abs(p.mean() - 5.0) < 1.0
    assert 1.2 < p.std() < 3.0


def test_approx_conv_path_chain():
    """Chained convolution x0→x2 through two relatives (reference
    approxConvBelief path walk)."""
    from incrementalinference.jl_tpu.ops.graphops import approx_conv_path
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)))
    for i in (1, 2):
        fg.add_variable(f"x{i}", ContinuousScalar)
        fg.add_factor([f"x{i-1}", f"x{i}"], LinearRelative(Normal(10.0, 0.5)))
    b = approx_conv_path(fg, "x0", "x2")
    p = np.asarray(b.points[:, 0])
    assert abs(p.mean() - 20.0) < 2.0
    # main graph beliefs untouched by the scratch walk
    assert abs(np.asarray(fg.points("x2")).mean() - 20.0) < 3.0


def test_eval_factor_temporary():
    from incrementalinference.jl_tpu.ops.graphops import eval_factor_temporary
    pts = eval_factor_temporary(
        LinearRelative(Normal(5.0, 0.1)),
        [ContinuousScalar, ContinuousScalar],
        [jnp.asarray([2.0]), jnp.asarray([0.0])])
    assert abs(float(jnp.mean(pts)) - 7.0) < 0.5
