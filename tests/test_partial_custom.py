"""User-defined partial priors and partial relatives (reference
testpartialconstraint.jl, testPartialFactors.jl): evaluation leaves
unconstrained dims untouched, partial info rides infoPerCoord through
convolutions, and tree solves combine partial + full info."""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousEuclid, ContinuousScalar,
                                         FactorModel, MvNormal, Normal,
                                         Prior, PriorModel, SolverParams,
                                         approx_conv_belief, initfg,
                                         register_factor_model, solve_tree)
from incrementalinference.jl_tpu.beliefs import is_partial
from incrementalinference.jl_tpu.graphinit import doautoinit
from incrementalinference.jl_tpu.ops.convolve import eval_factor


class _DevelopPartial(PriorModel):
    """Prior on a subset of dims (reference DevelopPartial,
    testpartialconstraint.jl:13-19)."""

    def __init__(self, Z, partial):
        self.Z = Z
        self.partial = tuple(partial)

    @property
    def zdim(self):
        return len(self.partial)

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def sample_points(self, key, n, manifold):
        import jax.numpy as jnp
        full = jnp.zeros((n, manifold.point_dim))
        return full.at[:, jnp.asarray(self.partial)].set(
            self.Z.sample(key, n))

    def residual(self, z, x):
        import jax.numpy as jnp
        return z - x[jnp.asarray(self.partial)]

    def mean_cov(self):
        return self.Z.mean_cov()


class _DevelopPartialPairwise(FactorModel):
    """Relative constraining only dim 2 of a 2-D pair (reference
    DevelopPartialPairwise, testpartialconstraint.jl:27-43)."""

    partial = (1,)

    def __init__(self, Z):
        self.Z = Z

    @property
    def zdim(self):
        return 1

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, z, x1, x2):
        return z - (x2[1:2] - x1[1:2])

    def mean_cov(self):
        return self.Z.mean_cov()


register_factor_model(_DevelopPartial, ("Z",), ("partial",))
register_factor_model(_DevelopPartialPairwise, ("Z",))


def test_is_partial_factor_flags():
    """isPartial on factors (reference testPartialFactors.jl)."""
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    f = fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    assert not f.is_partial

    fg2 = initfg()
    fg2.add_variable("x1", ContinuousEuclid(2))
    f2 = fg2.add_factor(["x1"], _DevelopPartial(Normal(0.0, 1.0), (0,)),
                        graphinit=False)
    assert f2.is_partial


def test_custom_partial_prior_eval_and_solve():
    """Partial prior evaluation moves only its dims; the solve combines
    full + partial info (reference testpartialconstraint.jl:46-125)."""
    N = 100
    fg = initfg(SolverParams(N=N))
    fg.add_variable("x1", ContinuousEuclid(2))
    f1 = fg.add_factor(["x1"], Prior(MvNormal([0.0, 0.0], [0.01, 0.01])))
    f2 = fg.add_factor(["x1"], _DevelopPartial(Normal(2.0, 1.0), (0,)),
                       graphinit=False)
    doautoinit(fg, "x1")

    # full prior eval: (N, 2) centred on 0 (:63-71)
    pts, mask = eval_factor(fg, f1.label, "x1")
    p = np.asarray(pts)
    assert p.shape == (N, 2)
    assert abs(p[:, 0].mean()) < 0.3
    assert list(np.asarray(mask)) == [True, True]

    # partial prior eval: dim0 moves to ~2, dim1 EXACTLY untouched (:76-95)
    x1_before = np.asarray(fg.points("x1")).copy()
    pts2, mask2 = eval_factor(fg, f2.label, "x1")
    p2 = np.asarray(pts2)
    assert abs(p2[:, 0].mean() - 2.0) < 0.75
    assert np.linalg.norm(x1_before[:, 0] - p2[:, 0]) > 2.0
    assert np.linalg.norm(x1_before[:, 1] - p2[:, 1]) < 1e-8
    assert list(np.asarray(mask2)) == [True, False]
    # graph memory untouched by the evaluation
    np.testing.assert_allclose(np.asarray(fg.points("x1")), x1_before)

    # conv belief is partial (:100-107)
    bel = approx_conv_belief(fg, f2.label, "x1")
    assert is_partial(bel)

    # solve: the tight full prior dominates the weak partial (:111-125)
    solve_tree(fg)
    p = np.asarray(fg.points("x1"))
    assert abs(p[:, 0].mean()) < 0.4
    assert abs(p[:, 1].mean()) < 0.4


def test_custom_partial_relative_solve():
    """A partial relative carries only its dims through the tree: x2 gets
    dim1 from the relative (+10) and dim0 from its own partial prior (-20)
    (reference testpartialconstraint.jl:128-220)."""
    N = 100
    fg = initfg(SolverParams(N=N))
    fg.add_variable("x1", ContinuousEuclid(2))
    fg.add_factor(["x1"], Prior(MvNormal([0.0, 0.0], [0.01, 0.01])))
    fg.add_variable("x2", ContinuousEuclid(2))
    f3 = fg.add_factor(["x1", "x2"],
                       _DevelopPartialPairwise(Normal(10.0, 1.0)))
    fg.add_factor(["x2"], _DevelopPartial(Normal(-20.0, 1.0), (0,)),
                  graphinit=False)
    doautoinit(fg, "x2")

    bel = approx_conv_belief(fg, f3.label, "x2")
    assert is_partial(bel)

    solve_tree(fg)
    p2 = np.asarray(fg.points("x2"))
    assert abs(p2[:, 0].mean() + 20.0) < 2.0, p2[:, 0].mean()
    assert abs(p2[:, 1].mean() - 10.0) < 2.0, p2[:, 1].mean()
