"""Belief-product kernel tests (reference testProductReproducable.jl and the
AMP manifoldProduct contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu.beliefs import loo_bandwidth, make_belief
from incrementalinference.jl_tpu.manifolds import Circle, Euclidean
from incrementalinference.jl_tpu.ops.product import (Proposal,
                                                     manifold_product,
                                                     pair_product_tangent)


def test_gaussian_product_moments():
    """Product of two single-mode KDEs ≈ analytic Gaussian product."""
    M = Euclidean(1)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    a = 0.0 + 2.0 * jax.random.normal(k1, (200, 1))       # N(0, 4)
    b = 4.0 + 2.0 * jax.random.normal(k2, (200, 1))       # N(4, 4)
    pa = Proposal(a, loo_bandwidth(M, a))
    pb = Proposal(b, loo_bandwidth(M, b))
    pts = manifold_product(M, [pa, pb], k3, 500)
    m = float(jnp.mean(pts))
    s = float(jnp.std(pts))
    # analytic: mean 2, var 2 → std 1.41; KDE smoothing widens slightly
    assert abs(m - 2.0) < 0.35, m
    assert 1.0 < s < 2.1, s


def test_product_kills_disjoint_modes():
    """A mode present in only one density must vanish from the product."""
    M = Euclidean(1)
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jnp.concatenate([3 * jax.random.normal(k1, (50, 1)),
                         100 + 3 * jax.random.normal(k2, (50, 1))])
    b = jnp.concatenate([3 * jax.random.normal(k2, (34, 1)),
                         100 + 3 * jax.random.normal(k3, (33, 1)),
                         300 + 3 * jax.random.normal(k1, (33, 1))])
    pts = manifold_product(
        M, [Proposal(a, loo_bandwidth(M, a)), Proposal(b, loo_bandwidth(M, b))],
        jax.random.PRNGKey(7), 200)
    p = np.asarray(pts[:, 0])
    assert np.mean(np.abs(p - 0) < 20) > 0.25
    assert np.mean(np.abs(p - 100) < 20) > 0.25
    assert np.mean(np.abs(p - 300) < 30) < 0.02      # killed
    assert np.mean(np.abs(p - 200) < 30) < 0.02      # no in-between ghosts


def test_single_proposal_passthrough():
    M = Euclidean(2)
    pts = 5.0 + jax.random.normal(jax.random.PRNGKey(2), (100, 2))
    prop = Proposal(pts, jnp.asarray([0.3, 0.3]))
    out = manifold_product(M, [prop], jax.random.PRNGKey(3), 100)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts))


def test_partial_proposal_keeps_old_dims():
    """A proposal constraining only dim 0 leaves dim 1 at old values."""
    M = Euclidean(2)
    key = jax.random.PRNGKey(4)
    old = jnp.stack([jnp.zeros(100), 7.0 + 0.1 * jax.random.normal(key, (100,))],
                    axis=1)
    a = jnp.stack([3.0 + 0.1 * jax.random.normal(key, (100,)),
                   jnp.zeros(100)], axis=1)
    pa = Proposal(a, jnp.asarray([0.1, 1.0]),
                  dim_mask=jnp.asarray([True, False]))
    pb = Proposal(a + 0.05, jnp.asarray([0.1, 1.0]),
                  dim_mask=jnp.asarray([True, False]))
    out = manifold_product(M, [pa, pb], key, 100, old_points=old)
    p = np.asarray(out)
    assert abs(p[:, 0].mean() - 3.0) < 0.2
    assert abs(p[:, 1].mean() - 7.0) < 0.2          # dim 1 from old points


def test_circular_product_wraps():
    """Product near ±pi works through the wrap."""
    M = Circle()
    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jnp.mod(3.1 + 0.1 * jax.random.normal(k1, (100, 1)) + jnp.pi,
                2 * jnp.pi) - jnp.pi
    b = jnp.mod(-3.1 + 0.1 * jax.random.normal(k2, (100, 1)) + jnp.pi,
                2 * jnp.pi) - jnp.pi
    out = manifold_product(
        M, [Proposal(a, jnp.asarray([0.1])), Proposal(b, jnp.asarray([0.1]))],
        k3, 100)
    # both clusters hug ±pi; the product must stay at the wrap, not at 0
    d = np.abs(np.abs(np.asarray(out[:, 0])) - np.pi)
    assert np.mean(d < 0.5) > 0.9


def test_pair_product_exactness():
    """pair product of two 1-kernel mixtures = analytic Gaussian product."""
    muA = jnp.asarray([[0.0]])
    muB = jnp.asarray([[4.0]])
    pA = jnp.asarray([[1.0 / 4.0]])        # var 4
    pB = jnp.asarray([[1.0 / 4.0]])
    mu, prec = pair_product_tangent(muA, pA, muB, pB,
                                    jax.random.PRNGKey(0), 16)
    np.testing.assert_allclose(np.asarray(mu), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(prec), 0.5, atol=1e-6)


def test_condensed_product_matches_exact_bimodal():
    """The subquadratic (cluster-condensed) path must reproduce the exact
    pair product's mode structure (VERDICT r3 item 3 — the role of the
    reference's multiscale ball-tree KDE, GraphProductOperations.jl:53):
    bimodal x bimodal with one shared mode -> all mass at the shared mode."""
    from incrementalinference.jl_tpu.ops.product import (
        CONDENSE_MIN_NB, condense_mixture, pair_product_tangent_weighted,
        product_cascade_tangent)

    rng = np.random.default_rng(0)
    N = 1024
    assert N >= CONDENSE_MIN_NB          # the auto route must condense
    a = np.where(rng.random(N) < 0.5, -5.0, 5.0) + \
        0.3 * rng.standard_normal(N)
    b = np.where(rng.random(N) < 0.5, 5.0, 15.0) + \
        0.3 * rng.standard_normal(N)
    muA, muB = jnp.asarray(a[:, None]), jnp.asarray(b[:, None])
    lam = jnp.full((N, 1), 1.0 / 0.3**2)
    key = jax.random.PRNGKey(1)

    mu_e, _ = pair_product_tangent(muA, lam, muB, lam, key, N)
    s, _ = product_cascade_tangent([muA, muB], [lam, lam], key, N)
    e = np.asarray(mu_e)[:, 0]
    c = np.asarray(s)[:, 0]
    assert np.mean(np.abs(e - 5.0) < 1.5) > 0.99
    assert np.mean(np.abs(c - 5.0) < 1.5) > 0.99
    assert abs(e.mean() - c.mean()) < 0.15

    # condensation itself preserves mixture mass placement
    cB, pB, lwB = condense_mixture(muB, lam, jax.random.PRNGKey(2), k=256)
    lw = np.asarray(lwB)
    alive = lw > -1e20
    w = np.exp(lw[alive]); w /= w.sum()
    wmean = float((w * np.asarray(cB)[alive, 0]).sum())
    assert abs(wmean - b.mean()) < 0.5


def test_condensed_product_trimodal_no_spurious_mass():
    """Trimodal x trimodal with two shared modes: the condensed cascade
    keeps both product modes and creates no mass in between (the failure
    mode the exact cascade was designed against must survive
    condensation)."""
    from incrementalinference.jl_tpu.ops.product import (
        product_cascade_tangent)

    rng = np.random.default_rng(3)
    N = 1024
    a = rng.integers(0, 3, N) * 10.0 + 0.3 * rng.standard_normal(N)
    b = rng.integers(1, 4, N) * 10.0 + 0.3 * rng.standard_normal(N)
    lam = jnp.full((N, 1), 1.0 / 0.3**2)
    s, _ = product_cascade_tangent(
        [jnp.asarray(a[:, None]), jnp.asarray(b[:, None])],
        [lam, lam], jax.random.PRNGKey(4), N)
    s = np.asarray(s)[:, 0]
    m10 = np.mean(np.abs(s - 10.0) < 2.0)
    m20 = np.mean(np.abs(s - 20.0) < 2.0)
    assert m10 > 0.2 and m20 > 0.2, (m10, m20)
    assert m10 + m20 > 0.98, (m10, m20)


def test_exact_path_still_default_small_n():
    """At reference sizes (N <= 512) the cascade must keep using the exact
    quadratic product (condensation only engages above CONDENSE_MIN_NB)."""
    from unittest import mock

    from incrementalinference.jl_tpu.ops import product as P

    N = 256
    muA = jnp.zeros((N, 1))
    lam = jnp.ones((N, 1))
    with mock.patch.object(P, "condense_mixture",
                           side_effect=AssertionError("condensed at small N")):
        s, _ = P.product_cascade_tangent([muA, muA], [lam, lam],
                                         jax.random.PRNGKey(0), N)
    assert s.shape == (N, 1)
