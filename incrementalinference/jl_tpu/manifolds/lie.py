"""Lie groups SO(2), SE(2), SO(3), SE(3) as pure-JAX coordinate functions.

TPU-native replacements for the Manifolds.jl groups the reference solves over
(SpecialEuclidean(2/3), SpecialOrthogonal(2/3); see reference
test/testSpecialEuclidean2Mani.jl, testSpecialOrthogonalMani.jl).

Point storage (fixed-shape coordinate arrays):
  SO2: (1,) angle            SE2: (3,)  x, y, theta
  SO3: (4,) unit quaternion  SE3: (7,)  x, y, z, qw, qx, qy, qz

All tangent vectors are coordinate (vee) vectors; all ops broadcast over
leading batch axes.  Small-angle branches use Taylor-safe `jnp.where` forms
so jacobians (jax.jacfwd in the batched Gauss-Newton kernels) stay finite.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import Circle, Manifold, wrap_angle

_EPS = 1e-8


def _snorm(x, keepdims=False):
    """Gradient-safe vector norm: jnp.linalg.norm has a NaN derivative at
    exactly zero, which jacfwd hits when linearizing retractions at the
    zero tangent (the batched Gauss-Newton's per-iteration base point)."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=keepdims) + 1e-24)


class SO2(Circle):
    """SO(2) stored as an angle; group-wise identical to RealCircleGroup."""


# ---------------------------------------------------------------------------
# quaternion helpers (w, x, y, z), broadcasting over leading axes
# ---------------------------------------------------------------------------

def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0 (two-to-one cover)
    return jnp.where(q[..., :1] < 0.0, -q, q)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vector v by unit quaternion q."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_from_rotvec(phi: jnp.ndarray) -> jnp.ndarray:
    t = _snorm(phi, keepdims=True)
    half = 0.5 * t
    # sin(half)/t with Taylor fallback 0.5 - t^2/48
    st = jnp.where(t > _EPS, jnp.sin(half) / jnp.where(t > _EPS, t, 1.0),
                   0.5 - t * t / 48.0)
    return jnp.concatenate([jnp.cos(half), st * phi], axis=-1)


def rotvec_from_quat(q: jnp.ndarray) -> jnp.ndarray:
    q = quat_normalize(q)
    w = q[..., :1]
    u = q[..., 1:]
    un = _snorm(u, keepdims=True)
    angle = 2.0 * jnp.arctan2(un, w)
    # angle/sin(angle/2) with fallback 2 + angle^2/12 as un -> 0
    scale = jnp.where(un > _EPS, angle / jnp.where(un > _EPS, un, 1.0),
                      2.0 / jnp.maximum(w, _EPS))
    return scale * u


def _hat3(phi: jnp.ndarray) -> jnp.ndarray:
    x, y, z = jnp.moveaxis(phi, -1, 0)
    o = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([o, -z, y], axis=-1),
        jnp.stack([z, o, -x], axis=-1),
        jnp.stack([-y, x, o], axis=-1),
    ], axis=-2)


def _se3_V(phi: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian V(phi) of SO(3): t = V @ rho in SE(3) exp."""
    t = _snorm(phi)
    t2 = t * t
    safe = t > _EPS
    td = jnp.where(safe, t, 1.0)
    A = jnp.where(safe, (1.0 - jnp.cos(td)) / (td * td), 0.5 - t2 / 24.0)
    B = jnp.where(safe, (td - jnp.sin(td)) / (td * td * td),
                  1.0 / 6.0 - t2 / 120.0)
    K = _hat3(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I + A[..., None, None] * K + B[..., None, None] * (K @ K)


def _se3_Vinv(phi: jnp.ndarray) -> jnp.ndarray:
    t = _snorm(phi)
    t2 = t * t
    safe = t > _EPS
    td = jnp.where(safe, t, 1.0)
    # coefficient of K@K in V^-1: (1 - theta*sin/(2(1-cos))) / theta^2
    cot = jnp.where(
        safe,
        (1.0 - 0.5 * td * jnp.sin(td) / jnp.maximum(1.0 - jnp.cos(td), _EPS))
        / (td * td),
        1.0 / 12.0 + t2 / 720.0,
    )
    K = _hat3(phi)
    I = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return I - 0.5 * K + cot[..., None, None] * (K @ K)


# ---------------------------------------------------------------------------
# SE(2)
# ---------------------------------------------------------------------------

class SE2(Manifold):
    """SpecialEuclidean(2): point (x, y, theta), tangent (rho_x, rho_y, phi)."""

    point_dim = 3
    dof = 3

    def identity(self):
        return jnp.zeros((3,), jnp.float32)

    def project(self, p):
        return p.at[..., 2].set(wrap_angle(p[..., 2]))

    @staticmethod
    def _rot(theta: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        c, s = jnp.cos(theta), jnp.sin(theta)
        return jnp.stack([c * v[..., 0] - s * v[..., 1],
                          s * v[..., 0] + c * v[..., 1]], axis=-1)

    def compose(self, p, q):
        t = p[..., :2] + self._rot(p[..., 2], q[..., :2])
        th = wrap_angle(p[..., 2] + q[..., 2])
        return jnp.concatenate([t, th[..., None]], axis=-1)

    def inverse(self, p):
        th = -p[..., 2]
        t = -self._rot(th, p[..., :2])
        return jnp.concatenate([t, wrap_angle(th)[..., None]], axis=-1)

    @staticmethod
    def Exp(X: jnp.ndarray) -> jnp.ndarray:
        rho, phi = X[..., :2], X[..., 2]
        safe = jnp.abs(phi) > _EPS
        ph = jnp.where(safe, phi, 1.0)
        A = jnp.where(safe, jnp.sin(ph) / ph, 1.0 - phi * phi / 6.0)
        B = jnp.where(safe, (1.0 - jnp.cos(ph)) / ph, 0.5 * phi)
        t = jnp.stack([A * rho[..., 0] - B * rho[..., 1],
                       B * rho[..., 0] + A * rho[..., 1]], axis=-1)
        return jnp.concatenate([t, wrap_angle(phi)[..., None]], axis=-1)

    @staticmethod
    def Log(p: jnp.ndarray) -> jnp.ndarray:
        t, phi = p[..., :2], wrap_angle(p[..., 2])
        safe = jnp.abs(phi) > _EPS
        ph = jnp.where(safe, phi, 1.0)
        A = jnp.where(safe, jnp.sin(ph) / ph, 1.0 - phi * phi / 6.0)
        B = jnp.where(safe, (1.0 - jnp.cos(ph)) / ph, 0.5 * phi)
        den = A * A + B * B
        rho = jnp.stack([(A * t[..., 0] + B * t[..., 1]),
                         (-B * t[..., 0] + A * t[..., 1])], axis=-1) / \
            jnp.maximum(den, _EPS)[..., None]
        return jnp.concatenate([rho, phi[..., None]], axis=-1)

    def exp(self, p, X):
        return self.compose(p, self.Exp(X))

    def log(self, p, q):
        return self.Log(self.compose(self.inverse(p), q))


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

class SO3(Manifold):
    """SpecialOrthogonal(3): unit quaternion point, rotation-vector tangent."""

    point_dim = 4
    dof = 3

    def identity(self):
        return jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32)

    def project(self, p):
        return quat_normalize(p)

    def compose(self, p, q):
        return quat_normalize(quat_mul(p, q))

    def inverse(self, p):
        return quat_conj(p)

    def exp(self, p, X):
        return quat_normalize(quat_mul(p, quat_from_rotvec(X)))

    def log(self, p, q):
        return rotvec_from_quat(quat_mul(quat_conj(p), q))


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

class SE3(Manifold):
    """SpecialEuclidean(3): point (t[3], quat[4]), tangent (rho[3], phi[3])."""

    point_dim = 7
    dof = 6

    def identity(self):
        return jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0], jnp.float32)

    def project(self, p):
        return jnp.concatenate([p[..., :3], quat_normalize(p[..., 3:])], axis=-1)

    def compose(self, p, q):
        t = p[..., :3] + quat_rotate(p[..., 3:], q[..., :3])
        r = quat_normalize(quat_mul(p[..., 3:], q[..., 3:]))
        return jnp.concatenate([t, r], axis=-1)

    def inverse(self, p):
        r = quat_conj(p[..., 3:])
        t = -quat_rotate(r, p[..., :3])
        return jnp.concatenate([t, r], axis=-1)

    @staticmethod
    def Exp(X: jnp.ndarray) -> jnp.ndarray:
        rho, phi = X[..., :3], X[..., 3:]
        V = _se3_V(phi)
        t = jnp.einsum("...ij,...j->...i", V, rho)
        return jnp.concatenate([t, quat_from_rotvec(phi)], axis=-1)

    @staticmethod
    def Log(p: jnp.ndarray) -> jnp.ndarray:
        phi = rotvec_from_quat(p[..., 3:])
        rho = jnp.einsum("...ij,...j->...i", _se3_Vinv(phi), p[..., :3])
        return jnp.concatenate([rho, phi], axis=-1)

    def exp(self, p, X):
        return self.compose(p, self.Exp(X))

    def log(self, p, q):
        return self.Log(self.compose(self.inverse(p), q))


class Sphere2(Manifold):
    """Unit sphere S² (reference testSphereMani.jl solves on
    Manifolds.Sphere(2)).  Points are unit 3-vectors; tangent coordinates
    live in a smooth local orthonormal basis built from the point (valid
    away from the -z pole).  Not a group: compose/inverse are undefined;
    priors/relatives use exp/log only."""

    point_dim = 3
    dof = 2

    def identity(self):
        return jnp.asarray([0.0, 0.0, 1.0], jnp.float32)

    def project(self, p):
        return p / jnp.linalg.norm(p, axis=-1, keepdims=True)

    @staticmethod
    def _basis(p):
        """Two orthonormal tangent vectors at p (smooth except near -e_z)."""
        # pick helper axis least aligned with p
        ez = jnp.asarray([0.0, 0.0, 1.0], p.dtype)
        ex = jnp.asarray([1.0, 0.0, 0.0], p.dtype)
        a = jnp.where((jnp.abs(p[..., 2:3]) < 0.9), ez, ex)
        b1 = jnp.cross(a, p)
        b1 = b1 / jnp.maximum(jnp.linalg.norm(b1, axis=-1, keepdims=True),
                              _EPS)
        b2 = jnp.cross(p, b1)
        return b1, b2

    def exp(self, p, X):
        b1, b2 = self._basis(p)
        v = X[..., 0:1] * b1 + X[..., 1:2] * b2          # ambient tangent
        t = _snorm(v, keepdims=True)
        ts = jnp.maximum(t, _EPS)
        q = jnp.cos(t) * p + jnp.sin(t) * v / ts
        return self.project(jnp.where(t > _EPS, q, p + v))

    def log(self, p, q):
        cos_t = jnp.clip(jnp.sum(p * q, axis=-1, keepdims=True), -1.0, 1.0)
        t = jnp.arccos(cos_t)
        v = q - cos_t * p                                # ambient direction
        vn = jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)
        w = jnp.where(t > _EPS, t * v / vn, v)
        b1, b2 = self._basis(p)
        return jnp.concatenate([jnp.sum(w * b1, axis=-1, keepdims=True),
                                jnp.sum(w * b2, axis=-1, keepdims=True)],
                               axis=-1)
