"""Model-family tree solves: mixture relatives, partial factors, SE(3)
chains (reference testMultimodal1D.jl, testPartialPrior / testPartialNH.jl,
SE(3) coverage)."""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousEuclid, ContinuousScalar,
                                         LinearRelative, ManifoldFactor,
                                         ManifoldPrior, Mixture, MvNormal,
                                         Normal, PartialPrior, Prior,
                                         VariableType, initfg, solve_tree)
from incrementalinference.jl_tpu.manifolds import SE3


def test_mixture_relative_bimodal_odometry():
    """Mixture over LinearRelative: odometry that jumped either +10 or +30
    (reference testMultimodal1D.jl)."""
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 0.5)))
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a", "b"], Mixture(LinearRelative,
                                      [Normal(10.0, 1.0), Normal(30.0, 1.0)],
                                      [0.5, 0.5]))
    solve_tree(fg)
    p = np.asarray(fg.points("b")[:, 0])
    m10 = np.mean(np.abs(p - 10.0) < 5.0)
    m30 = np.mean(np.abs(p - 30.0) < 5.0)
    assert m10 > 0.2 and m30 > 0.2, (m10, m30)
    assert m10 + m30 > 0.85


def test_partial_prior_in_tree():
    """A PartialPrior as the sole constraint on one dim pins exactly that
    dim through a tree solve; untouched dims keep their belief (reference
    partial-factor semantics, setPointPartial!).  Note: when another full
    factor also constrains the dim, the posterior is the precision-weighted
    product (verified separately below)."""
    from incrementalinference.jl_tpu.graphinit import init_variable
    fg = initfg()
    fg.add_variable("y", ContinuousEuclid(2))
    init_variable(fg, "y", MvNormal([3.0, 0.0], [0.3, 0.3]))
    fg.add_factor(["y"], PartialPrior(Normal(100.0, 0.5), (1,)),
                  graphinit=False)
    solve_tree(fg)
    p = np.asarray(fg.points("y"))
    assert abs(p[:, 1].mean() - 100.0) < 2.0     # pinned by partial prior
    assert abs(p[:, 0].mean() - 3.0) < 1.5       # untouched dim preserved


def test_partial_conflict_precision_weighted():
    """Conflicting full-relative + partial-prior constraints combine as a
    precision-weighted product (Bayesian behavior, not overwrite)."""
    fg = initfg()
    fg.add_variable("x", ContinuousEuclid(2))
    fg.add_variable("y", ContinuousEuclid(2))
    fg.add_factor(["x"], Prior(MvNormal([5.0, 7.0], [0.2, 0.2])))
    fg.add_factor(["x", "y"], LinearRelative(MvNormal([10.0, 0.0],
                                                      [0.3, 0.3])))
    fg.add_factor(["y"], PartialPrior(Normal(100.0, 0.5), (1,)))
    solve_tree(fg)
    p = np.asarray(fg.points("y"))
    assert abs(p[:, 0].mean() - 15.0) < 2.0      # from the relative chain
    # dim1: between the relative's 7 and the partial's 100
    assert 15.0 < p[:, 1].mean() < 95.0


def test_se3_pose_chain():
    se3 = SE3()
    pose3 = VariableType("Pose3", se3)
    fg = initfg()
    fg.add_variable("x0", pose3)
    fg.add_factor(["x0"], ManifoldPrior(
        se3, se3.identity(), MvNormal([0.0] * 6, [0.02] * 6)))
    z = MvNormal([1.0, 0.0, 0.0, 0.0, 0.0, 0.4], [0.02] * 6)
    for i in (1, 2):
        fg.add_variable(f"x{i}", pose3)
        fg.add_factor([f"x{i-1}", f"x{i}"], ManifoldFactor(se3, z))
    solve_tree(fg)

    truth = se3.identity()
    step = se3.Exp(jnp.asarray([1.0, 0, 0, 0, 0, 0.4]))
    for i in (1, 2):
        truth = se3.compose(truth, step)
        p = np.asarray(fg.points(f"x{i}"))
        d = np.asarray(se3.dist(jnp.asarray(p), truth))
        assert np.mean(d < 0.5) > 0.8, (i, d.mean())
        # quaternions stay normalized
        np.testing.assert_allclose(np.linalg.norm(p[:, 3:], axis=1), 1.0,
                                   atol=1e-3)
