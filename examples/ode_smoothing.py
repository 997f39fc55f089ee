"""Dynamics-constrained smoothing with DERelative (reference
ext/IncrInfrDiffEqFactorExt.jl; test territory testDERelative.jl).

A forced first-order system ẋ = -0.5x + u(t) is observed sparsely and
noisily; DERelative factors chain the states through the integrated flow
(one fused RK4-under-scan kernel per convolution on TPU), and a third
factor variable estimates an unknown decay-rate parameter from the data.
Run: PYTHONPATH=. python examples/ode_smoothing.py
"""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, Normal, Prior,
                                         initfg, solve_tree)
from incrementalinference.jl_tpu.distributions import MvNormal
from incrementalinference.jl_tpu.models import DERelative


def mean(fg, v):
    return float(np.asarray(fg.points(v)[:, 0]).mean())


def main():
    # control trajectory u(t) = sin(t), sampled on a grid; DERelative
    # passes it to the dynamics as `data` and the user interpolates
    tgrid = jnp.linspace(0.0, 6.0, 25)
    ugrid = jnp.sin(tgrid)

    def f(t, x, u):
        return -0.5 * x + jnp.interp(t, u[0], u[1])

    data = jnp.stack([tgrid, ugrid])

    # ground truth by integrating the same flow
    probe = DERelative(f, 0.0, 6.0, dim=1, data=data, steps=96)
    truth = {0: 2.0}
    for k in range(3):
        seg = DERelative(f, 2.0 * k, 2.0 * (k + 1), dim=1, data=data,
                         steps=32)
        truth[k + 1] = float(seg.flow(jnp.asarray([truth[k]]))[0])

    fg = initfg()
    for k in range(4):
        fg.add_variable(f"x{k}", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(2.0, 0.05)))
    # noisy observation only at the END of the window
    fg.add_factor(["x3"], Prior(Normal(truth[3] + 0.1, 0.2)))
    for k in range(3):
        fg.add_factor([f"x{k}", f"x{k+1}"],
                      DERelative(f, 2.0 * k, 2.0 * (k + 1),
                                 Z=MvNormal([0.0], [0.01]), dim=1,
                                 data=data, steps=32))
    solve_tree(fg)
    print("forced-flow smoothing (truth -> posterior mean):")
    for k in range(4):
        print(f"  x{k}: {truth[k]:+.3f} -> {mean(fg, f'x{k}'):+.3f}")
        assert abs(mean(fg, f"x{k}") - truth[k]) < 0.3

    # parameter estimation: unknown decay rate k as a THIRD factor
    # variable (reference n-ary DERelative splat)
    def g(t, x, k):
        return -k[0] * x

    de = DERelative(g, 0.0, 2.0, MvNormal([0.0], [1e-4]), dim=1, steps=32)
    x1_truth = 2.0 * float(np.exp(-1.4))        # k=0.7
    fg = initfg()
    for v in ("a", "b", "k"):
        fg.add_variable(v, ContinuousScalar)
    fg.add_factor(["a"], Prior(Normal(2.0, 0.02)))
    fg.add_factor(["b"], Prior(Normal(x1_truth, 0.02)))
    fg.add_factor(["k"], Prior(Normal(0.5, 0.5)))
    fg.add_factor(["a", "b", "k"], de)
    solve_tree(fg)
    print(f"decay-rate estimation: k = {mean(fg, 'k'):.3f} (truth 0.700)")
    assert abs(mean(fg, "k") - 0.7) < 0.15


if __name__ == "__main__":
    main()
