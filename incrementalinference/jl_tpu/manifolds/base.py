"""Manifold abstraction as pure-JAX coordinate functions.

Replaces the reference's dependence on Manifolds.jl / ManifoldsBase.jl
(reference: src/manifolds/services/ManifoldsExtentions.jl, and the
`getManifold` trait used throughout).  Design rules, TPU-first:

- A point is a fixed-shape ``(point_dim,)`` float array; a tangent vector is
  its coordinate vector ``(dof,)`` (i.e. ``vee``-ed — we never materialise
  matrix tangents).  Every op broadcasts over arbitrary leading batch axes so
  ``vmap``/``pjit`` and Pallas kernels can treat particle sets ``(N, dim)``
  as plain arrays.
- Manifold objects are stateless, hashable singletons so they can be passed
  as static arguments through ``jax.jit``.
- Group-valued manifolds use the *local/body-frame* tangent convention:
  ``exp(p, X) = p ∘ Exp(X)`` and ``log(p, q) = Log(p⁻¹ ∘ q)``, the standard
  SLAM convention (matches the reference's use of default orthogonal bases
  on SpecialEuclidean, src/Factors/GenericFunctions.jl:72-100).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Manifold:
    """Base manifold: ``point_dim`` ambient coords, ``dof`` tangent coords."""

    point_dim: int
    dof: int

    # -- identification (hashable static-arg singletons) --
    def __eq__(self, other):
        return type(self) is type(other) and self._key() == other._key()

    def __hash__(self):
        return hash((type(self).__name__, self._key()))

    def _key(self):
        return ()

    def __repr__(self):
        k = self._key()
        return f"{type(self).__name__}{k if k else ''}"

    # -- core chart ops (must broadcast over leading axes) --
    def identity(self) -> jnp.ndarray:
        raise NotImplementedError

    def exp(self, p: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
        """Retract tangent coords X at base point p."""
        raise NotImplementedError

    def log(self, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        """Tangent coords of q in the chart at p."""
        raise NotImplementedError

    def dist(self, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        X = self.log(p, q)
        return jnp.sqrt(jnp.sum(X * X, axis=-1))

    def project(self, p: jnp.ndarray) -> jnp.ndarray:
        """Re-normalise an ambient point onto the manifold (no-op by default)."""
        return p

    # -- group ops (defined for Lie-group manifolds) --
    def compose(self, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def inverse(self, p: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # -- batched helpers --
    def mean(self, points: jnp.ndarray, weights: jnp.ndarray | None = None,
             iters: int = 8) -> jnp.ndarray:
        """(Weighted) Karcher mean of ``points`` of shape (N, point_dim).

        Fixed iteration count keeps the op jit-friendly; Euclidean subclasses
        override with the closed form.
        """
        n = points.shape[-2]
        w = (jnp.full((n,), 1.0 / n, points.dtype) if weights is None
             else weights / jnp.sum(weights))

        p0 = points[..., 0, :]

        def body(_, p):
            X = self.log(p[..., None, :], points)      # (..., N, dof)
            step = jnp.sum(w[..., :, None] * X, axis=-2)
            return self.exp(p, step)

        return jax.lax.fori_loop(0, iters, body, p0)


class Euclidean(Manifold):
    """TranslationGroup(n) — the reference's Position{N}/ContinuousEuclid{N}
    (reference: src/Variables/DefaultVariables.jl:9-52)."""

    def __init__(self, n: int):
        self.n = int(n)
        self.point_dim = self.n
        self.dof = self.n

    def _key(self):
        return (self.n,)

    def identity(self):
        return jnp.zeros((self.n,), jnp.float32)

    def exp(self, p, X):
        return p + X

    def log(self, p, q):
        return q - p

    def compose(self, p, q):
        return p + q

    def inverse(self, p):
        return -p

    def mean(self, points, weights=None, iters=0):
        if weights is None:
            return jnp.mean(points, axis=-2)
        w = weights / jnp.sum(weights)
        return jnp.sum(w[..., :, None] * points, axis=-2)


def wrap_angle(t: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]."""
    return t - 2.0 * jnp.pi * jnp.round(t / (2.0 * jnp.pi))


class Circle(Manifold):
    """RealCircleGroup — the reference's Circular variable
    (reference: src/Variables/Circular.jl)."""

    point_dim = 1
    dof = 1

    def identity(self):
        return jnp.zeros((1,), jnp.float32)

    def exp(self, p, X):
        return wrap_angle(p + X)

    def log(self, p, q):
        return wrap_angle(q - p)

    def compose(self, p, q):
        return wrap_angle(p + q)

    def inverse(self, p):
        return wrap_angle(-p)

    def project(self, p):
        return wrap_angle(p)
