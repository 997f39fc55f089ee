"""Manifold unit tests (reference test/manifolds/manifolddiff.jl analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incrementalinference.jl_tpu.manifolds import (SE2, SE3, SO2, SO3, Circle,
                                                   Euclidean, Product)

ALL = [Euclidean(1), Euclidean(3), Circle(), SO2(), SE2(), SO3(), SE3(),
       Product(Euclidean(2), Circle())]


@pytest.mark.parametrize("M", ALL, ids=lambda m: repr(m))
def test_exp_log_roundtrip(M):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    p = M.exp(M.identity(), 0.3 * jax.random.normal(k1, (M.dof,)))
    X = 0.5 * jax.random.normal(k2, (M.dof,))
    q = M.exp(p, X)
    X2 = M.log(p, q)
    np.testing.assert_allclose(np.asarray(X2), np.asarray(X),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("M", ALL, ids=lambda m: repr(m))
def test_group_identities(M):
    key = jax.random.PRNGKey(1)
    p = M.exp(M.identity(), 0.4 * jax.random.normal(key, (M.dof,)))
    pinv = M.inverse(p)
    e = M.compose(p, pinv)
    np.testing.assert_allclose(np.asarray(M.log(M.identity(), e)),
                               np.zeros(M.dof), atol=1e-4)


@pytest.mark.parametrize("M", ALL, ids=lambda m: repr(m))
def test_batched_broadcasting(M):
    key = jax.random.PRNGKey(2)
    X = 0.3 * jax.random.normal(key, (7, M.dof))
    p = jnp.broadcast_to(M.identity(), (7, M.point_dim))
    q = M.exp(p, X)
    assert q.shape == (7, M.point_dim)
    np.testing.assert_allclose(np.asarray(M.log(p, q)), np.asarray(X),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("M", ALL, ids=lambda m: repr(m))
def test_mean_of_cluster(M):
    key = jax.random.PRNGKey(3)
    center = M.exp(M.identity(), 0.2 * jnp.ones((M.dof,)))
    X = 0.05 * jax.random.normal(key, (50, M.dof))
    pts = M.exp(jnp.broadcast_to(center, (50, M.point_dim)), X)
    mu = M.mean(pts)
    assert float(M.dist(mu, center)) < 0.05


def test_circle_wrap():
    C = Circle()
    p = jnp.asarray([3.0])
    q = jnp.asarray([-3.0])
    # going +0.3 rad from 3.0 wraps past pi
    np.testing.assert_allclose(float(C.log(p, q)[0]), 2 * np.pi - 6.0,
                               atol=1e-5)


def test_se2_compose_matches_matrix():
    M = SE2()
    a = jnp.asarray([1.0, 2.0, 0.5])
    b = jnp.asarray([-0.5, 0.25, -0.2])

    def mat(p):
        c, s = np.cos(p[2]), np.sin(p[2])
        return np.array([[c, -s, p[0]], [s, c, p[1]], [0, 0, 1]])

    got = np.asarray(M.compose(a, b))
    want = mat(np.asarray(a)) @ mat(np.asarray(b))
    np.testing.assert_allclose(got[:2], want[:2, 2], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.cos(got[2]), want[0, 0], atol=1e-6)


def test_so3_rotation_action():
    from incrementalinference.jl_tpu.manifolds import quat_rotate
    M = SO3()
    # rotation of pi/2 about z maps x-axis to y-axis
    q = M.exp(M.identity(), jnp.asarray([0.0, 0.0, np.pi / 2]))
    v = quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-5)


def test_jit_and_grad_through_manifold_ops():
    M = SE2()

    @jax.jit
    def loss(X):
        q = M.exp(M.identity(), X)
        return jnp.sum(M.log(M.identity(), q) ** 2)

    g = jax.grad(loss)(jnp.asarray([0.1, -0.2, 0.3]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_rotation_only_exp_consistency():
    """exp on SE(3) of a rotation-only tangent equals (0, exp_SO3(w)) —
    the reference's Manifolds.jl consistency check
    (testBasicManifolds.jl:11-21, w = [0, -0.78, -0.18])."""
    import jax.numpy as jnp
    import numpy as np

    se3, so3 = SE3(), SO3()
    w = jnp.asarray([0.0, -0.78, -0.18])
    xi = jnp.concatenate([jnp.zeros(3), w])          # zero translation
    p = se3.Exp(xi)                                  # (tx ty tz qw qx qy qz)
    np.testing.assert_allclose(np.asarray(p[:3]), np.zeros(3), atol=1e-6)
    q = so3.exp(so3.identity(), w)
    # quaternion sign ambiguity: compare up to sign
    qa, qb = np.asarray(p[3:]), np.asarray(q)
    assert np.allclose(qa, qb, atol=1e-6) or np.allclose(qa, -qb, atol=1e-6)
