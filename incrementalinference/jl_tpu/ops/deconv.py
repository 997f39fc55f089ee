"""Factor deconvolution — invert a factor for its measurement.

Reference: src/services/DeconvUtils.jl (approxDeconv :32-162,
approxDeconvBelief :178+): given the beliefs of a factor's variables, solve
per particle for the *measurement* that zeroes the residual.  Powers the
joint "differential" up-messages (TreeMessageUtils.jl
addLikelihoodsDifferentialCHILD!, :279-335) and factor-vs-data consistency
checks.

The reference optimizes each particle's measurement serially
(_solveLambdaNumericMeas, NumericalCalculations.jl:153-177); here it is one
vmapped damped Gauss-Newton over the measurement coordinates.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..beliefs import make_belief

__all__ = ["approx_deconv", "approx_deconv_belief", "mmd"]


@functools.partial(jax.jit, static_argnames=("iters",))
def _solve_measurement(model, meas0: jnp.ndarray, points, iters: int = 25,
                       damping: float = 1e-6) -> jnp.ndarray:
    """Per-particle: min_z ||residual(z, pts_i)||², batched via vmap."""

    def one(z0, pts_i):
        zdim = z0.shape[-1]

        def res(z):
            return model.residual(z, *pts_i)

        def body(_, z):
            r = res(z)
            J = jax.jacfwd(res)(z)
            JtJ = J.T @ J + damping * jnp.eye(zdim, dtype=z0.dtype)
            return z - jnp.linalg.solve(JtJ, J.T @ r)

        return jax.lax.fori_loop(0, iters, body, z0)

    return jax.vmap(one)(meas0, points)


def approx_deconv(fg, factor_label: str, key=None,
                  solve_key: str = "default",
                  n: int | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (solved_measurements, sampled_measurements) — the deconv
    estimate vs. the factor's own generative samples (reference approxDeconv
    return convention, DeconvUtils.jl:32-107)."""
    f = fg.factor(factor_label)
    model = f.model
    key = key if key is not None else fg.next_key()

    n_out = n or fg.params.N
    pts = tuple(fg.points(v, solve_key)[:n_out] for v in f.variables)
    meas0 = model.sample(key, n_out)

    solved = _solve_measurement(model, meas0, pts,
                                iters=fg.params.conv_iters)
    return solved, meas0


def approx_deconv_belief(fg, factor_label: str, key=None,
                         solve_key: str = "default", n: int | None = None):
    """Deconv result wrapped as a belief over measurement coordinates
    (reference approxDeconvBelief)."""
    from ..manifolds import Euclidean
    solved, _ = approx_deconv(fg, factor_label, key=key, solve_key=solve_key,
                              n=n)
    return make_belief(Euclidean(solved.shape[-1]), solved)


def mmd(a: jnp.ndarray, b: jnp.ndarray, bw: float | None = None) -> float:
    """Maximum-mean-discrepancy between two particle sets (reference ``mmd``,
    src/services/SolverUtilities.jl:25-48) — the quality metric used by the
    reference's deconv/consistency tests."""
    if bw is None:
        pooled = jnp.concatenate([a, b])
        d = pooled[:, None, :] - pooled[None, :, :]
        bw = jnp.median(jnp.sum(d * d, axis=-1)) + 1e-9

    def k(x, y):
        d = x[:, None, :] - y[None, :, :]
        return jnp.mean(jnp.exp(-jnp.sum(d * d, axis=-1) / bw))

    return float(k(a, a) + k(b, b) - 2.0 * k(a, b))
