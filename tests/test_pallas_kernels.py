"""Pallas kernel tests (interpret mode on the CPU mesh).

Compiled-mode hardware validation lives in benchmarks/pallas_tpu_check.py
(run manually on the TPU): the compiled kernel executes and matches XLA
at every tested shape; it is the production path beyond
ops/product.LARGE_PAIR_THRESHOLD, where the plain-XLA fused row-logsumexp
can no longer compile (element-count limit at 2^32 pairs).
"""

import jax
import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu.ops.kernels.pallas_product import (
    pair_row_logsumexp, row_logsumexp_pallas)
from incrementalinference.jl_tpu.ops.product import _pair_logW


def test_row_logsumexp_matches_xla():
    key = jax.random.PRNGKey(0)
    muA = jax.random.normal(key, (300, 8))
    muB = jax.random.normal(jax.random.PRNGKey(1), (200, 8)) + 0.5
    precA = jnp.ones((300, 8)) * 2.0
    precB = jnp.ones((200, 8)) * 3.0
    ref = jax.scipy.special.logsumexp(
        _pair_logW(muA, precA, muB, precB), axis=1)
    got = pair_row_logsumexp(muA, precA, muB, precB, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_partial_dims_zero_precision():
    muA = jnp.asarray([[0.0, 5.0]])
    muB = jnp.asarray([[0.0, -5.0], [3.0, 100.0]])
    precA = jnp.asarray([[1.0, 0.0]])       # dim 1 unconstrained
    precB = jnp.ones((2, 2))
    ref = jax.scipy.special.logsumexp(
        _pair_logW(muA, precA, muB, precB), axis=1)
    got = pair_row_logsumexp(muA, precA, muB, precB, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_large_pair_product_matches_small_path():
    """The Pallas-backed large-N pair product agrees statistically with the
    materialized path."""
    from incrementalinference.jl_tpu.ops.product import (
        pair_product_tangent, pair_product_tangent_large)

    key = jax.random.PRNGKey(3)
    muA = jnp.concatenate([jax.random.normal(key, (100, 2)),
                           10.0 + jax.random.normal(jax.random.PRNGKey(4),
                                                    (100, 2))])
    muB = muA + 0.1
    precA = jnp.ones((200, 2)) * 4.0
    precB = jnp.ones((200, 2)) * 4.0
    mu1, p1 = pair_product_tangent(muA, precA, muB, precB,
                                   jax.random.PRNGKey(5), 400)
    mu2, p2 = pair_product_tangent_large(muA, precA, muB, precB,
                                         jax.random.PRNGKey(5), 400,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))
    # both bimodal with similar mass split
    for mu in (mu1, mu2):
        m0 = float(jnp.mean(jnp.linalg.norm(mu, axis=1) < 5))
        assert 0.25 < m0 < 0.75, m0
