"""Sampleable measurement distributions (the reference's ``SamplableBelief``).

Parity set (reference: src/entities/BeliefTypes.jl:47-57 union and
src/Serialization/services/SerializingDistributions.jl:4-38): Normal,
MvNormal, Uniform, Categorical, Rayleigh, AliasingScalarSampler — plus the
KDE belief type which lives in :mod:`beliefs`.

All distributions are registered as JAX pytrees (parameters are leaves) so a
factor carrying one can be passed straight into jitted/vmapped kernels.
``sample`` returns coordinate arrays of shape ``(n, dim)``; ``mean_cov``
feeds the parametric solver's measurement extraction (reference
``getMeasurementParametric``, src/parametric/services/ParametricUtils.jl:57-124).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as _np


def _register(cls, fields):
    def unflatten(aux, leaves):
        # bypass __init__: unflatten must store leaves verbatim — they may
        # be tracers or ArgInfo placeholders (jit/vmap/lower), which the
        # constructors' jnp.asarray coercion would reject
        d = object.__new__(cls)
        for f, v in zip(fields, leaves):
            setattr(d, f, v)
        return d

    jax.tree_util.register_pytree_node(
        cls,
        lambda d: (tuple(getattr(d, f) for f in fields), None),
        unflatten,
    )
    return cls


class Distribution:
    dim: int = 1

    def sample(self, key, n: int) -> jnp.ndarray:
        raise NotImplementedError

    def logpdf(self, x: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def mean_cov(self):
        """(mean, covariance) for Gaussian-approx parametric solves."""
        raise NotImplementedError


class Normal(Distribution):
    def __init__(self, mu=0.0, sigma=1.0):
        # host numpy, NOT device arrays: constructing distributions must
        # not cost device round-trips (graph build is host-side; the
        # dispatch path converts once per factor via ops.graphops
        # device_model) — eager jnp.asarray here was ~30% of wide-graph
        # construction time through the TPU tunnel
        self.mu = _np.asarray(mu, _np.float32)
        self.sigma = _np.asarray(sigma, _np.float32)

    dim = 1

    def sample(self, key, n):
        return self.mu + self.sigma * jax.random.normal(key, (n, 1))

    def logpdf(self, x):
        z = (x[..., 0] - self.mu) / self.sigma
        return -0.5 * z * z - jnp.log(self.sigma) - 0.5 * jnp.log(2 * jnp.pi)

    def mean_cov(self):
        return jnp.reshape(self.mu, (1,)), jnp.reshape(self.sigma**2, (1, 1))


class MvNormal(Distribution):
    def __init__(self, mu, cov):
        # host numpy (see Normal.__init__)
        self.mu = _np.atleast_1d(_np.asarray(mu, _np.float32))
        cov = _np.asarray(cov, _np.float32)
        if cov.ndim == 1:          # diagonal std-vector convenience (Julia style)
            cov = _np.diag(cov**2)
        self.cov = cov

    @property
    def dim(self):
        return self.mu.shape[-1]

    def sample(self, key, n):
        L = jnp.linalg.cholesky(self.cov)
        z = jax.random.normal(key, (n, self.mu.shape[-1]))
        return self.mu + z @ L.T

    def logpdf(self, x):
        d = x - self.mu
        sol = jnp.linalg.solve(self.cov, d[..., None])[..., 0]
        _, logdet = jnp.linalg.slogdet(self.cov)
        k = self.mu.shape[-1]
        return -0.5 * (jnp.sum(d * sol, -1) + logdet + k * jnp.log(2 * jnp.pi))

    def mean_cov(self):
        return self.mu, self.cov


class Uniform(Distribution):
    def __init__(self, a=0.0, b=1.0):
        self.a = _np.asarray(a, _np.float32)      # host (see Normal)
        self.b = _np.asarray(b, _np.float32)

    dim = 1

    def sample(self, key, n):
        return jax.random.uniform(key, (n, 1), minval=self.a, maxval=self.b)

    def logpdf(self, x):
        inside = (x[..., 0] >= self.a) & (x[..., 0] <= self.b)
        return jnp.where(inside, -jnp.log(self.b - self.a), -jnp.inf)

    def mean_cov(self):
        m = 0.5 * (self.a + self.b)
        v = (self.b - self.a) ** 2 / 12.0
        return jnp.reshape(m, (1,)), jnp.reshape(v, (1, 1))


class Rayleigh(Distribution):
    def __init__(self, sigma=1.0):
        self.sigma = _np.asarray(sigma, _np.float32)  # host (see Normal)

    dim = 1

    def sample(self, key, n):
        u = jax.random.uniform(key, (n, 1), minval=1e-7, maxval=1.0)
        return self.sigma * jnp.sqrt(-2.0 * jnp.log(u))

    def logpdf(self, x):
        r = x[..., 0]
        return jnp.where(
            r >= 0,
            jnp.log(jnp.maximum(r, 1e-30)) - 2 * jnp.log(self.sigma)
            - r * r / (2 * self.sigma**2),
            -jnp.inf)

    def mean_cov(self):
        m = self.sigma * jnp.sqrt(jnp.pi / 2.0)
        v = (2.0 - jnp.pi / 2.0) * self.sigma**2
        return jnp.reshape(m, (1,)), jnp.reshape(v, (1, 1))


class Categorical(Distribution):
    """Discrete distribution over {0..k-1} (hypothesis selection)."""

    def __init__(self, p):
        self.p = _np.asarray(p, _np.float32)      # host (see Normal)

    @property
    def dim(self):
        return 1

    def sample(self, key, n):
        return jax.random.categorical(
            key, jnp.log(jnp.maximum(self.p, 1e-30)), shape=(n, 1)).astype(jnp.float32)

    def logpdf(self, x):
        idx = x[..., 0].astype(jnp.int32)
        return jnp.log(jnp.maximum(self.p[idx], 1e-30))

    def mean_cov(self):
        k = self.p.shape[0]
        idx = jnp.arange(k, dtype=jnp.float32)
        m = jnp.sum(self.p * idx)
        v = jnp.sum(self.p * (idx - m) ** 2)
        return jnp.reshape(m, (1,)), jnp.reshape(v, (1, 1))


class AliasingScalarSampler(Distribution):
    """Weighted-grid 1-D sampler for intensity maps
    (reference: src/entities/AliasScalarSampling.jl:13-59).

    Applies the reference's SNR floor: weights below
    ``quantile(weights, snr_floor)`` are zeroed before normalisation.
    """

    def __init__(self, x, weights, snr_floor: float = 0.0):
        x = jnp.asarray(x, jnp.float32)
        w = jnp.asarray(weights, jnp.float32)
        floor = jnp.quantile(w, snr_floor) if snr_floor > 0 else -jnp.inf
        w = jnp.where(w >= floor, w, 0.0)
        self.x = x
        self.weights = w / jnp.sum(w)

    dim = 1

    def sample(self, key, n):
        idx = jax.random.categorical(
            key, jnp.log(jnp.maximum(self.weights, 1e-30)), shape=(n,))
        return self.x[idx][:, None]

    def logpdf(self, x):
        # nearest-bin approximation
        i = jnp.argmin(jnp.abs(self.x[None, :] - x[..., :1]), axis=-1)
        return jnp.log(jnp.maximum(self.weights[i], 1e-30))

    def mean_cov(self):
        m = jnp.sum(self.weights * self.x)
        v = jnp.sum(self.weights * (self.x - m) ** 2)
        return jnp.reshape(m, (1,)), jnp.reshape(v, (1, 1))


_register(Normal, ("mu", "sigma"))
_register(MvNormal, ("mu", "cov"))
_register(Uniform, ("a", "b"))
_register(Rayleigh, ("sigma",))
_register(Categorical, ("p",))
_register(AliasingScalarSampler, ("x", "weights"))


class ManifoldKernelDensity(Distribution):
    """A particle KDE usable anywhere a SamplableBelief goes — the user
    side of the reference's ``manikde!`` (ApproxManifoldProducts MKD):
    ``Prior(manikde!(ContinuousScalar, pts))``, mixture components, or
    relative measurement densities (test/testlocalconstraintexamples.jl,
    testMixtureLinearConditional.jl "fancy" component).

    ``manifold`` must be a coordinate manifold (point_dim == dof) since
    measurement samples are coordinate rows; use ManifoldPrior for group-
    valued priors.
    """

    def __init__(self, manifold, points, bw=None):
        from .beliefs import make_belief
        if manifold.point_dim != manifold.dof:
            raise ValueError("manikde measurement densities need a "
                             "coordinate manifold (point_dim == dof)")
        self.manifold = manifold
        if hasattr(points, "points"):          # already a Belief
            self.belief = points
        else:
            pts = jnp.asarray(points, jnp.float32)
            if pts.ndim == 1:
                pts = pts[:, None]
            self.belief = make_belief(manifold, pts,
                                      bw=None if bw is None
                                      else jnp.asarray(bw, jnp.float32))

    @property
    def dim(self):
        return self.manifold.dof

    @property
    def points(self):
        return self.belief.points

    def sample(self, key, n):
        from .beliefs import kde_sample
        return kde_sample(self.manifold, self.belief, key, n)

    def logpdf(self, x):
        from .beliefs import kde_logpdf
        return kde_logpdf(self.manifold, self.belief, x)

    def mean_cov(self):
        from .beliefs import mean_cov as bmc
        return bmc(self.manifold, self.belief.points)


def manikde(vartype_or_manifold, points, bw=None) -> ManifoldKernelDensity:
    """Build a KDE belief from points (reference manikde!).  Accepts a
    VariableType (ContinuousScalar, …) or a Manifold."""
    manifold = getattr(vartype_or_manifold, "manifold", vartype_or_manifold)
    import numpy as _np
    pts = _np.asarray(points, dtype=_np.float32)
    return ManifoldKernelDensity(manifold, pts, bw=bw)


jax.tree_util.register_pytree_node(
    ManifoldKernelDensity,
    lambda d: ((d.belief,), (d.manifold,)),
    lambda aux, leaves: ManifoldKernelDensity(aux[0], leaves[0]),
)
