"""ODE-propagation relative factors.

Reference: ext/IncrInfrDiffEqFactorExt.jl (DERelative :66+): a binary factor
whose prediction integrates user dynamics ẋ = f(t, x, u) from the first
variable's epoch to the second's, with additive process noise.  The
reference calls DifferentialEquations.jl; here integration is a fixed-step
RK4 under `lax.scan` — static step count, fully jittable/vmappable, so the
whole particle batch integrates as one kernel.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..distributions import Distribution, MvNormal
from .factors import FactorModel

__all__ = ["DERelative", "rk4_integrate"]


def rk4_integrate(f: Callable, x0: jnp.ndarray, t0: float, t1: float,
                  steps: int = 16) -> jnp.ndarray:
    """Fixed-step RK4 from t0 to t1 (static ``steps`` for XLA)."""
    h = (t1 - t0) / steps

    def step(x, i):
        t = t0 + i * h
        k1 = f(t, x)
        k2 = f(t + 0.5 * h, x + 0.5 * h * k1)
        k3 = f(t + 0.5 * h, x + 0.5 * h * k2)
        k4 = f(t + h, x + h * k3)
        return x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    xT, _ = jax.lax.scan(step, x0, jnp.arange(steps, dtype=jnp.float32))
    return xT


class DERelative(FactorModel):
    """x1 = ∫ f dt from x0 over [t0, t1], plus tangent process noise z.

    residual(z, x0, x1) = (Φ(x0) + z) − x1 with Φ the RK4 flow map
    (reference DERelative's forward-problem residual).
    """

    def __init__(self, f: Callable, t0: float, t1: float,
                 Z: Optional[Distribution] = None, dim: int = 1,
                 steps: int = 16):
        self.f = f
        self.t0 = float(t0)
        self.t1 = float(t1)
        self.Z = Z or MvNormal([0.0] * dim, [1e-2] * dim)
        self.steps = int(steps)

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, meas, x0, x1):
        pred = rk4_integrate(self.f, x0, self.t0, self.t1, self.steps)
        return (pred + meas) - x1

    def mean_cov(self):
        return self.Z.mean_cov()


jax.tree_util.register_pytree_node(
    DERelative,
    lambda d: ((d.Z,), (d.f, d.t0, d.t1, d.steps)),
    lambda aux, ch: _unflatten_de(aux, ch))


def _unflatten_de(aux, ch):
    d = object.__new__(DERelative)
    (d.Z,) = ch
    d.f, d.t0, d.t1, d.steps = aux
    return d
