"""Distribution + belief tests (reference testPackedDistributions-style
coverage of the SamplableBelief family, plus KDE bandwidth behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from incrementalinference.jl_tpu.beliefs import (kde_logpdf, kde_sample,
                                                 loo_bandwidth, make_belief,
                                                 ppe)
from incrementalinference.jl_tpu.distributions import (AliasingScalarSampler,
                                                       Categorical, MvNormal,
                                                       Normal, Rayleigh,
                                                       Uniform)
from incrementalinference.jl_tpu.manifolds import Euclidean

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("dist,mean,std", [
    (Normal(3.0, 2.0), 3.0, 2.0),
    (Uniform(0.0, 12.0), 6.0, 12.0 / np.sqrt(12)),
    (Rayleigh(2.0), 2.0 * np.sqrt(np.pi / 2), np.sqrt((2 - np.pi / 2) * 4)),
])
def test_sampling_moments(dist, mean, std):
    s = np.asarray(dist.sample(KEY, 4000)[:, 0])
    assert abs(s.mean() - mean) < 0.15 * max(std, 1.0)
    assert abs(s.std() - std) < 0.15 * max(std, 1.0)
    m, c = dist.mean_cov()
    assert abs(float(m[0]) - mean) < 1e-4
    assert abs(float(c[0, 0]) - std**2) < 1e-3 * max(std**2, 1.0)


def test_mvnormal_cov():
    cov = jnp.asarray([[4.0, 1.0], [1.0, 2.0]])
    d = MvNormal([1.0, -1.0], cov)
    s = np.asarray(d.sample(KEY, 8000))
    np.testing.assert_allclose(s.mean(0), [1.0, -1.0], atol=0.1)
    np.testing.assert_allclose(np.cov(s.T), np.asarray(cov), atol=0.25)


def test_categorical_and_alias_sampler():
    c = Categorical([0.1, 0.0, 0.9])
    s = np.asarray(c.sample(KEY, 2000)[:, 0])
    assert abs(np.mean(s == 2) - 0.9) < 0.05
    assert np.mean(s == 1) == 0.0

    a = AliasingScalarSampler([0.0, 1.0, 2.0], [0.0, 0.3, 0.7])
    s = np.asarray(a.sample(KEY, 2000)[:, 0])
    assert abs(np.mean(s == 2.0) - 0.7) < 0.05
    assert np.mean(s == 0.0) == 0.0


def test_loo_bandwidth_multimodal_vs_unimodal():
    """LOO bandwidth must track within-mode spread, not global std."""
    M = Euclidean(1)
    k1, k2 = jax.random.split(KEY)
    uni = 2.0 * jax.random.normal(k1, (100, 1))
    multi = jnp.concatenate([2.0 * jax.random.normal(k1, (50, 1)),
                             200.0 + 2.0 * jax.random.normal(k2, (50, 1))])
    bw_uni = float(loo_bandwidth(M, uni)[0])
    bw_multi = float(loo_bandwidth(M, multi)[0])
    assert bw_multi < 10.0, bw_multi       # global std would give ~35
    assert 0.2 < bw_uni < 3.0, bw_uni


def test_kde_logpdf_and_sample_roundtrip():
    M = Euclidean(1)
    pts = 5.0 + 1.0 * jax.random.normal(KEY, (200, 1))
    b = make_belief(M, pts)
    s = np.asarray(kde_sample(M, b, KEY, 2000)[:, 0])
    assert abs(s.mean() - 5.0) < 0.2
    lp = kde_logpdf(M, b, jnp.asarray([[5.0], [50.0]]))
    assert float(lp[0]) > float(lp[1]) + 10.0


def test_ppe_fields():
    M = Euclidean(2)
    pts = jax.random.normal(KEY, (100, 2))
    b = make_belief(M, pts)
    est = ppe(M, b)
    for k in ("mean", "max", "suggested"):
        assert est[k].shape == (2,)
        assert np.all(np.isfinite(np.asarray(est[k])))
