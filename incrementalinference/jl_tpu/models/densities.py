"""Grid-map densities: heatmap and level-set beliefs.

Reference: src/entities/ExtDensities.jl (HeatmapGridDensity :27-44,
LevelSetGridNormal :66-75), ext/HeatmapSampler.jl (sampleHeatmap),
src/Factors/PartialPriorPassThrough.jl.  The reference samples heatmaps via
Interpolations.jl + KDE fitting; here sampling is a categorical draw over
grid cells with in-cell jitter — one fused XLA op, no interpolation library.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..distributions import Distribution
from .factors import PriorModel, _register_model

__all__ = ["HeatmapGridDensity", "LevelSetGridNormal",
           "PartialPriorPassThrough"]


class HeatmapGridDensity(Distribution):
    """Density over R² proportional to a weight grid (intensity map).

    ``data``: (H, W) weights; ``domain``: (xs (W,), ys (H,)) cell-center
    coordinates.  Sampling: categorical over cells ∝ weight, uniform jitter
    within a cell (reference HeatmapGridDensity → sampleHeatmap → manikde!).
    """

    def __init__(self, data, domain: Tuple, hist_digits: int = 5,
                 N: int = 10000):
        self.data = jnp.asarray(data, jnp.float32)
        self.xs = jnp.asarray(domain[0], jnp.float32)
        self.ys = jnp.asarray(domain[1], jnp.float32)
        w = jnp.maximum(self.data, 0.0)
        self.weights = (w / jnp.sum(w)).reshape(-1)
        self.N = N

    @property
    def dim(self):
        return 2

    def _cell_sizes(self):
        dx = (self.xs[1] - self.xs[0]) if self.xs.shape[0] > 1 else 1.0
        dy = (self.ys[1] - self.ys[0]) if self.ys.shape[0] > 1 else 1.0
        return dx, dy

    def sample(self, key, n):
        kc, kj = jax.random.split(key)
        idx = jax.random.categorical(
            kc, jnp.log(jnp.maximum(self.weights, 1e-30)), shape=(n,))
        W = self.xs.shape[0]
        iy, ix = idx // W, idx % W
        dx, dy = self._cell_sizes()
        jit = jax.random.uniform(kj, (n, 2), minval=-0.5, maxval=0.5)
        x = self.xs[ix] + jit[:, 0] * dx
        y = self.ys[iy] + jit[:, 1] * dy
        return jnp.stack([x, y], axis=-1)

    def logpdf(self, p):
        ix = jnp.clip(jnp.searchsorted(self.xs, p[..., 0]), 0,
                      self.xs.shape[0] - 1)
        iy = jnp.clip(jnp.searchsorted(self.ys, p[..., 1]), 0,
                      self.ys.shape[0] - 1)
        w = self.weights.reshape(self.data.shape)[iy, ix]
        return jnp.log(jnp.maximum(w, 1e-30))

    def mean_cov(self):
        pts = self.sample(jax.random.PRNGKey(0), 1024)
        mu = jnp.mean(pts, axis=0)
        d = pts - mu
        return mu, (d.T @ d) / pts.shape[0]


class LevelSetGridNormal(Distribution):
    """Density concentrated on the ``level``-set of a heatmap: cell weights
    ∝ N(level; data, sigma) (reference LevelSetGridNormal,
    ExtDensities.jl:66-75) — e.g. a terrain-elevation contour likelihood."""

    def __init__(self, data, domain: Tuple, level: float, sigma: float,
                 sigma_scale: float = 3.0):
        data = jnp.asarray(data, jnp.float32)
        w = jnp.exp(-0.5 * ((data - level) / sigma) ** 2)
        self.data = data                  # raw elevation (for serialization)
        self.level = float(level)
        self.sigma = float(sigma)
        self.heatmap = HeatmapGridDensity(w, domain)

    @property
    def dim(self):
        return 2

    def sample(self, key, n):
        return self.heatmap.sample(key, n)

    def logpdf(self, p):
        return self.heatmap.logpdf(p)

    def mean_cov(self):
        return self.heatmap.mean_cov()


class PartialPriorPassThrough(PriorModel):
    """Partial prior over a grid density, passed straight through the
    proposal stage without re-convolution (reference
    PartialPriorPassThrough + the calcProposalBelief fast path,
    src/services/ApproxConv.jl:197-227)."""

    def __init__(self, Z: Distribution, partial: Sequence[int]):
        self.Z = Z
        self.partial = tuple(int(i) for i in partial)

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def sample_points(self, key, n, manifold):
        return self.Z.sample(key, n)

    def residual(self, meas, x):
        idx = jnp.asarray(self.partial)
        return meas - x[..., idx]

    def mean_cov(self):
        return self.Z.mean_cov()


_register_model(PartialPriorPassThrough, ("Z",), ("partial",))
jax.tree_util.register_pytree_node(
    HeatmapGridDensity,
    lambda h: ((h.data, h.xs, h.ys, h.weights), (h.N,)),
    lambda aux, ch: _unflatten_heatmap(aux, ch))
jax.tree_util.register_pytree_node(
    LevelSetGridNormal,
    lambda l: ((l.heatmap, l.data), (l.level, l.sigma)),
    lambda aux, ch: _unflatten_levelset(aux, ch))


def _unflatten_heatmap(aux, ch):
    h = object.__new__(HeatmapGridDensity)
    h.data, h.xs, h.ys, h.weights = ch
    h.N = aux[0]
    return h


def _unflatten_levelset(aux, ch):
    l = object.__new__(LevelSetGridNormal)
    l.heatmap, l.data = ch
    l.level, l.sigma = aux
    return l
