"""ODE-propagation relative factors.

Reference: ext/IncrInfrDiffEqFactorExt.jl (DERelative :66-125, residual
:188-225, sampleFactor :272-318): an n-ary factor whose prediction
integrates user dynamics ẋ = f(t, x, u, p₃, …) from the first variable's
epoch to the second's, with additive process noise.  Forcing/data inputs
enter two ways, as in the reference: a static ``data`` payload handed to
``f`` on every call (the reference's ``data`` problem parameter), and
any variables beyond the first two, whose current points are spliced into
``f``'s parameters per evaluation (the reference's
``_maketuplebeyond2args`` splat, :66-90, :137-146).

The reference builds explicit forward AND backward DifferentialEquations
problems because its per-particle optimizer can only resample the
integrated endpoint; it re-integrates backward when solving for the first
variable (:272-300).  Here the residual differentiates *through* the
fixed-step RK4 flow (``lax.scan`` + ``jacfwd``), so one forward residual
serves every solve direction — solving x₀ from x₁ is Gauss-Newton through
the flow map with its exact jacobian.  The backward flow is still exposed
(:meth:`DERelative.flow`, ``backward=True``) for endpoint prediction and
parity checks; fixed step count keeps everything jittable/vmappable so the
whole particle batch integrates as one kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..distributions import Distribution, MvNormal
from .factors import FactorModel

__all__ = ["DERelative", "rk4_integrate"]


def rk4_integrate(f: Callable, x0: jnp.ndarray, t0: float, t1: float,
                  steps: int = 16, *params) -> jnp.ndarray:
    """Fixed-step RK4 from t0 to t1 (static ``steps`` for XLA).

    ``f(t, x, *params)``; integrates backward naturally when t1 < t0.
    """
    h = (t1 - t0) / steps

    def step(x, i):
        t = t0 + i * h
        k1 = f(t, x, *params)
        k2 = f(t + 0.5 * h, x + 0.5 * h * k1, *params)
        k3 = f(t + 0.5 * h, x + 0.5 * h * k2, *params)
        k4 = f(t + h, x + h * k3, *params)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    xT, _ = jax.lax.scan(step, x0, jnp.arange(steps, dtype=jnp.float32))
    return xT


class DERelative(FactorModel):
    """x1 = ∫ f dt from x0 over [t0, t1] (+ tangent process noise z), with
    optional forcing data and extra parameter variables.

    ``f(t, x, *params)`` where ``params = (data,) + extra_points`` —
    ``data`` only when given (e.g. a control trajectory the user interprets
    with ``jnp.interp``), ``extra_points`` the per-particle points of any
    variables beyond the first two (reference n-ary DERelative).

    residual(z, x0, x1, *extra) = (Φ(x0; params) + z) − x1 with Φ the RK4
    flow map; Gauss-Newton through Φ solves any variable — x1 (forward
    prediction), x0 (the reference's backwardProblem direction), or an
    extra parameter variable (the reference's solvefor>2 re-integration,
    ext/IncrInfrDiffEqFactorExt.jl:203-216).
    """

    def __init__(self, f: Callable, t0: float, t1: float,
                 Z: Optional[Distribution] = None, dim: int = 1,
                 steps: int = 16, data: Any = None):
        self.f = f
        self.t0 = float(t0)
        self.t1 = float(t1)
        self.Z = Z or MvNormal([0.0] * dim, [1e-2] * dim)
        self.steps = int(steps)
        self.data = None if data is None else jax.tree.map(jnp.asarray, data)

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def _params(self, extra):
        return ((self.data,) + tuple(extra) if self.data is not None
                else tuple(extra))

    def flow(self, x, *extra, backward: bool = False) -> jnp.ndarray:
        """Integrate one point through the dynamics: forward Φ_{t0→t1}(x),
        or the reference's backwardProblem Φ_{t1→t0}(x) when ``backward``."""
        t0, t1 = (self.t1, self.t0) if backward else (self.t0, self.t1)
        return rk4_integrate(self.f, x, t0, t1, self.steps,
                             *self._params(extra))

    def residual(self, meas, x0, x1, *extra):
        pred = rk4_integrate(self.f, x0, self.t0, self.t1, self.steps,
                             *self._params(extra))
        return (pred + meas) - x1

    def mean_cov(self):
        return self.Z.mean_cov()


jax.tree_util.register_pytree_node(
    DERelative,
    lambda d: ((d.Z, d.data), (d.f, d.t0, d.t1, d.steps)),
    lambda aux, ch: _unflatten_de(aux, ch))


def _unflatten_de(aux, ch):
    d = object.__new__(DERelative)
    d.Z, d.data = ch
    d.f, d.t0, d.t1, d.steps = aux
    return d
