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
