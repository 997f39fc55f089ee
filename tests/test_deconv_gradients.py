"""Deconvolution, factor-gradient, and tether tests
(reference testDefaultDeconv.jl, factordiff.jl, testDeadReckoningTether
analogues)."""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, initfg)
from incrementalinference.jl_tpu.graphinit import init_variable
from incrementalinference.jl_tpu.ops.deconv import approx_deconv, mmd
from incrementalinference.jl_tpu.ops.gradients import (
    FactorGradientsCached, calc_perturbation_from_variable, factor_jacobian)
from incrementalinference.jl_tpu.tether import (accumulate_factor_means,
                                                solve_factor_parametric)


def _chain():
    fg = initfg()
    fg.add_variable("a", ContinuousScalar)
    fg.add_variable("b", ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
    init_variable(fg, "b", Normal(10.0, 1.0))
    f = fg.add_factor(["a", "b"], LinearRelative(Normal(10.0, 1.0)),
                      graphinit=False)
    return fg, f


def test_deconv_recovers_measurement():
    """With a≈0 and b≈10 the deconv of the relative factor must recover
    z ≈ 10 (reference testDefaultDeconv basic case)."""
    fg, f = _chain()
    solved, sampled = approx_deconv(fg, f.label)
    s = np.asarray(solved[:, 0])
    assert abs(s.mean() - 10.0) < 1.0, s.mean()
    assert s.std() < 3.0
    # sampled measurements come from the factor's own generative model
    assert abs(np.asarray(sampled).mean() - 10.0) < 1.0


def test_mmd_separates_clouds():
    a = jnp.linspace(0, 1, 50)[:, None]
    b = jnp.linspace(0, 1, 50)[:, None] + 0.01
    c = jnp.linspace(5, 6, 50)[:, None]
    assert mmd(a, b) < 0.01
    assert mmd(a, c) > 0.1


def test_factor_jacobian_linear_relative():
    fg, f = _chain()
    J = factor_jacobian(fg, f.label)
    # residual z - (b - a): d/da = +1, d/db = -1
    np.testing.assert_allclose(np.asarray(J), [[1.0, -1.0]], atol=1e-4)


def test_perturbation_propagation():
    fg, f = _chain()
    cache = FactorGradientsCached(fg, f.label)
    out = calc_perturbation_from_variable(cache, "a", jnp.asarray([2.0]))
    # moving a by +2 moves b by +2 through the rigid relative factor
    np.testing.assert_allclose(np.asarray(out["b"]), [2.0], atol=1e-3)


def test_solve_factor_parametric_and_tether():
    fg = initfg()
    prev = None
    for i in range(4):
        fg.add_variable(f"x{i}", ContinuousScalar)
        if i == 0:
            fg.add_factor(["x0"], Prior(Normal(0.0, 0.1)))
        else:
            fg.add_factor([prev, f"x{i}"], LinearRelative(Normal(5.0, 0.5)),
                          graphinit=False)
        prev = f"x{i}"
    chain = [fl for fl in fg.lsf() if len(fg.factor(fl).variables) == 2]
    end = accumulate_factor_means(fg, chain)
    assert abs(float(end[0]) - 15.0) < 0.5, end

    single = solve_factor_parametric(fg, chain[0], "x1",
                                     values={"x0": jnp.asarray([100.0])})
    assert abs(float(single[0]) - 105.0) < 0.2


def test_factor_jacobian_reference_blocks():
    """LinearRelative on Euclidean(2): exact jacobian blocks and the
    reference's perturbation answers (testFactorGradients.jl:14-70 —
    perturb x1 by [1,1] -> x2 responds [1,1])."""
    from incrementalinference.jl_tpu import ContinuousEuclid, MvNormal

    fg = initfg()
    fg.add_variable("x1", ContinuousEuclid(2))
    fg.add_variable("x2", ContinuousEuclid(2))
    init_variable(fg, "x1", [np.zeros(2) for _ in range(50)])
    init_variable(fg, "x2", [np.array([10.0, 0.0]) for _ in range(50)])
    f = fg.add_factor(["x1", "x2"],
                      LinearRelative(MvNormal([10.0, 0.0], [1.0, 1.0])),
                      graphinit=False)

    J = np.asarray(factor_jacobian(fg, f.label))
    # residual z - (x2 - x1): d/dx1 = +I, d/dx2 = -I
    np.testing.assert_allclose(J, [[1, 0, -1, 0], [0, 1, 0, -1]], atol=1e-5)

    cache = FactorGradientsCached(fg, f.label)
    ret = calc_perturbation_from_variable(cache, "x1",
                                          np.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(ret["x2"]), [1.0, 1.0], atol=1e-5)


def test_partial_relative_perturbation():
    """A dim-2-only relative propagates perturbations only through its
    constrained dim (reference testFactorGradients.jl:93-132)."""
    from incrementalinference.jl_tpu import (ContinuousEuclid, FactorModel,
                                             register_factor_model)

    class _Dim2Only(FactorModel):
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

    register_factor_model(_Dim2Only, ("Z",))

    fg = initfg()
    fg.add_variable("x1", ContinuousEuclid(2))
    fg.add_variable("x2", ContinuousEuclid(2))
    init_variable(fg, "x1", [np.zeros(2) for _ in range(50)])
    init_variable(fg, "x2", [np.array([0.0, 10.0]) for _ in range(50)])
    f = fg.add_factor(["x1", "x2"], _Dim2Only(Normal(10.0, 1.0)),
                      graphinit=False)

    cache = FactorGradientsCached(fg, f.label)
    ret = calc_perturbation_from_variable(cache, "x1",
                                          np.array([1.0, 1.0]))
    # x1 influences x2 only through dim 2 (reference :115-120)
    np.testing.assert_allclose(np.asarray(ret["x2"]), [0.0, 1.0], atol=1e-5)


def test_eval_factor_temporary():
    """Throwaway-graph factor evaluation lands on the measurement
    (reference testGradientUtils.jl:7-26: B[1] ≈ [10.0])."""
    from incrementalinference.jl_tpu import ContinuousScalar
    from incrementalinference.jl_tpu.ops.graphops import eval_factor_temporary

    pts = eval_factor_temporary(
        LinearRelative(Normal(10.0, 0.01)),
        [ContinuousScalar, ContinuousScalar],
        [np.zeros(1), np.zeros(1)], n=50)
    m = float(np.mean(np.asarray(pts)))
    assert abs(m - 10.0) < 0.1, m
