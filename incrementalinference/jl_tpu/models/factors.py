"""Factor model library.

TPU-native rebuild of the reference factor zoo (src/Factors/*.jl; SURVEY.md
§2.7).  A factor model is a pure-data object (registered pytree) exposing:

- ``sample(key, n)``: draw n measurement coordinate rows ``(n, zdim)``;
- ``residual(meas, *points)``: per-sample residual ``(resdim,)`` — pure JAX,
  vmapped/jacfwd'ed by the convolution and parametric kernels (the
  reference's CalcFactor functor, src/entities/CalcFactor.jl:33-63);
- priors additionally ``sample_points(key, n, manifold)``: direct particle
  proposals (reference evalPotentialSpecific for AbstractPrior,
  src/services/EvalFactor.jl:400-542);
- ``mean_cov()``: Gaussian approximation for the parametric stack
  (reference getMeasurementParametric, ParametricUtils.jl:57-124).

No Optim-style per-factor solvers live here — solving is centralised in the
batched Gauss-Newton kernels (ops/convolve.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..beliefs import Belief, kde_sample, mean_cov as belief_mean_cov
from ..distributions import Distribution
from ..manifolds import Manifold, wrap_angle

__all__ = [
    "FactorModel", "PriorModel", "Prior", "LinearRelative", "EuclidDistance",
    "Mixture", "PriorCircular", "CircularCircular", "PartialPrior",
    "MsgPrior", "MetaPrior", "GenericMarginal", "ManifoldFactor",
    "ManifoldPrior",
]


class FactorModel:
    is_prior: bool = False
    # tangent dims of the solve-target constrained by this factor, or None
    partial: Optional[Tuple[int, ...]] = None

    @property
    def zdim(self) -> int:
        raise NotImplementedError

    def sample(self, key, n: int) -> jnp.ndarray:
        raise NotImplementedError

    def residual(self, meas: jnp.ndarray, *points: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def mean_cov(self):
        raise NotImplementedError


class PriorModel(FactorModel):
    is_prior = True

    def sample_points(self, key, n: int, manifold: Manifold) -> jnp.ndarray:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Euclidean core factors
# ---------------------------------------------------------------------------

class Prior(PriorModel):
    """Full-dim prior z ⊖ x on TranslationGroup
    (reference src/Factors/DefaultPrior.jl:7-19)."""

    def __init__(self, Z: Distribution):
        self.Z = Z

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def sample_points(self, key, n, manifold):
        return self.Z.sample(key, n)

    def residual(self, meas, x):
        return meas - x

    def mean_cov(self):
        return self.Z.mean_cov()


class LinearRelative(FactorModel):
    """x2 = x1 + z (reference src/Factors/LinearRelative.jl:12-50)."""

    linear_residual = True

    def __init__(self, Z: Distribution):
        self.Z = Z

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, meas, x1, x2):
        return meas - (x2 - x1)

    def mean_cov(self):
        return self.Z.mean_cov()


class EuclidDistance(FactorModel):
    """Range factor z - |x2 - x1| (reference src/Factors/EuclidDistance.jl:8-20).
    1-D measurement over any-dim endpoints → ring/multimodal posteriors."""

    def __init__(self, Z: Distribution):
        self.Z = Z

    zdim = 1

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, meas, x1, x2):
        d = x2 - x1
        return meas - jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True) + 1e-12)

    def mean_cov(self):
        return self.Z.mean_cov()


# ---------------------------------------------------------------------------
# Circular factors (reference src/Factors/Circular.jl:13-60)
# ---------------------------------------------------------------------------

class PriorCircular(PriorModel):
    def __init__(self, Z: Distribution):
        self.Z = Z

    zdim = 1

    def sample(self, key, n):
        return wrap_angle(self.Z.sample(key, n))

    def sample_points(self, key, n, manifold):
        return wrap_angle(self.Z.sample(key, n))

    def residual(self, meas, x):
        return wrap_angle(meas - x)

    def mean_cov(self):
        return self.Z.mean_cov()


class CircularCircular(FactorModel):
    linear_residual = True

    def __init__(self, Z: Distribution):
        self.Z = Z

    zdim = 1

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, meas, x1, x2):
        return wrap_angle(meas - wrap_angle(x2 - x1))

    def mean_cov(self):
        return self.Z.mean_cov()


# ---------------------------------------------------------------------------
# Mixtures (reference src/Factors/Mixture.jl:36-60)
# ---------------------------------------------------------------------------

class Mixture(FactorModel):
    """Mixture over any prior/relative: per-sample categorical component
    labels choose which component generates each measurement row."""

    def __init__(self, mechanics, components: Sequence[Distribution],
                 diversity: Sequence[float] | None = None):
        """``mechanics``: a FactorModel *class* (e.g. Prior, LinearRelative)
        or instance whose residual mechanics are reused; ``components``:
        per-mode measurement distributions; ``diversity``: mode weights."""
        if isinstance(mechanics, type):
            mechanics = mechanics(components[0])
        self.mechanics = mechanics
        self.components = tuple(components)
        w = (jnp.full((len(components),), 1.0 / len(components))
             if diversity is None else jnp.asarray(diversity, jnp.float32))
        self.diversity = w / jnp.sum(w)
        self.labels = None     # last-sampled component labels (debug parity)

    @property
    def is_prior(self):
        return self.mechanics.is_prior

    @property
    def linear_residual(self):
        return getattr(self.mechanics, "linear_residual", False)

    @property
    def zdim(self):
        return self.components[0].dim

    def _sample_mixture(self, key, n):
        klab, *kcomp = jax.random.split(key, 1 + len(self.components))
        labels = jax.random.categorical(
            klab, jnp.log(self.diversity), shape=(n,))
        draws = jnp.stack([c.sample(k, n)
                           for c, k in zip(self.components, kcomp)])  # (C,n,z)
        self.labels = labels
        return jnp.take_along_axis(
            draws, labels[None, :, None], axis=0)[0]

    def sample(self, key, n):
        return self._sample_mixture(key, n)

    def sample_points(self, key, n, manifold):
        meas = self._sample_mixture(key, n)
        if hasattr(self.mechanics, "meas_to_points"):
            return self.mechanics.meas_to_points(meas, manifold)
        return meas

    def residual(self, meas, *points):
        return self.mechanics.residual(meas, *points)

    def mean_cov(self):
        # moment-matched Gaussian (max-mixture handling lives in parametric/)
        mus, covs = zip(*(c.mean_cov() for c in self.components))
        mus = jnp.stack(mus)
        covs = jnp.stack(covs)
        w = self.diversity[:, None]
        m = jnp.sum(w * mus, axis=0)
        d = mus - m
        cov = jnp.sum(w[..., None] * (covs + d[:, :, None] * d[:, None, :]),
                      axis=0)
        return m, cov

    def mixture_mean_cov(self):
        """Per-component (weights, means, covs) for max-mixture parametric."""
        mus, covs = zip(*(c.mean_cov() for c in self.components))
        return self.diversity, jnp.stack(mus), jnp.stack(covs)


# ---------------------------------------------------------------------------
# Partials (reference src/Factors/PartialPrior.jl:10-24)
# ---------------------------------------------------------------------------

class PartialPrior(PriorModel):
    """Prior constraining a subset of tangent dims."""

    def __init__(self, Z: Distribution, partial: Sequence[int]):
        self.Z = Z
        self.partial = tuple(int(i) for i in partial)

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def sample_points(self, key, n, manifold):
        # caller overlays the sampled sub-dims onto existing points
        return self.Z.sample(key, n)

    def residual(self, meas, x):
        idx = jnp.asarray(self.partial)
        return meas - x[..., idx]

    def mean_cov(self):
        return self.Z.mean_cov()


# ---------------------------------------------------------------------------
# Tree-message and meta factors
# ---------------------------------------------------------------------------

class MsgPrior(PriorModel):
    """Prior carrying a KDE tree message (reference src/Factors/MsgPrior.jl:9-36)."""

    def __init__(self, belief: Belief, manifold: Manifold,
                 ipc: jnp.ndarray | None = None):
        self.belief = belief
        self.manifold = manifold
        self.ipc = belief.ipc if ipc is None else ipc

    @property
    def zdim(self):
        return self.manifold.dof

    def sample(self, key, n):
        return kde_sample(self.manifold, self.belief, key, n)

    def sample_points(self, key, n, manifold):
        return kde_sample(manifold, self.belief, key, n)

    def residual(self, meas, x):
        return self.manifold.log(x, meas)

    def mean_cov(self):
        return belief_mean_cov(self.manifold, self.belief.points)


class MetaPrior(PriorModel):
    """Data-only factor, skipped by all solvers
    (reference src/Factors/MetaPrior.jl)."""

    def __init__(self, data=None):
        self.data = data

    zdim = 0

    def sample(self, key, n):
        return jnp.zeros((n, 0))

    def sample_points(self, key, n, manifold):
        raise RuntimeError("MetaPrior carries no belief")

    def residual(self, meas, x):
        return jnp.zeros((0,))


class GenericMarginal(FactorModel):
    """Symbolic chain-rule placeholder inserted during elimination only
    (reference src/Factors/GenericMarginal.jl:5-21)."""

    zdim = 0

    def sample(self, key, n):
        return jnp.zeros((n, 0))

    def residual(self, meas, *points):
        return jnp.zeros((0,))


# ---------------------------------------------------------------------------
# Generic on-manifold factors (reference src/Factors/GenericFunctions.jl)
# ---------------------------------------------------------------------------

class ManifoldFactor(FactorModel):
    """Relative factor on a group manifold: measurement is a tangent vector,
    residual = log(p1⁻¹∘p2) - z (GenericFunctions.jl:72-100)."""

    # log-residuals are near-linear in the solve tangent: Newton converges
    # in a handful of steps (cuts the batched-GN iteration budget ~3x)
    quasi_linear_residual = True

    def __init__(self, manifold: Manifold, Z: Distribution):
        self.manifold = manifold
        self.Z = Z

    @property
    def zdim(self):
        return self.manifold.dof

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, meas, p1, p2):
        return self.manifold.log(p1, p2) - meas

    def mean_cov(self):
        return self.Z.mean_cov()


class ManifoldPrior(PriorModel):
    """Prior at point p0 with tangent noise Z (GenericFunctions.jl:162-214)."""

    quasi_linear_residual = True

    def __init__(self, manifold: Manifold, p0: jnp.ndarray, Z: Distribution):
        self.manifold = manifold
        self.p0 = jnp.asarray(p0, jnp.float32)
        self.Z = Z

    @property
    def zdim(self):
        return self.manifold.dof

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def meas_to_points(self, meas, manifold):
        return manifold.exp(jnp.broadcast_to(
            self.p0, (meas.shape[0],) + self.p0.shape), meas)

    def sample_points(self, key, n, manifold):
        return self.meas_to_points(self.Z.sample(key, n), manifold)

    def residual(self, meas, x):
        target = self.manifold.exp(self.p0, meas)
        return self.manifold.log(x, target)

    def mean_cov(self):
        mu_t, cov = self.Z.mean_cov()
        return mu_t, cov


# ---------------------------------------------------------------------------
# Pytree registration: factor models flow straight into jitted kernels.
# Array-ish fields are leaves; structural fields (manifolds, dim tuples) are
# static aux data, so XLA recompiles only per model *structure*.
# ---------------------------------------------------------------------------

#: registry of (cls, children-fields, aux-fields) for every factor model —
#: powers jit pytree flattening AND generic packed serialization of custom
#: user factors (the reference's packed-converter dispatch,
#: DispatchPackedConversions.jl:25-160)
MODEL_REGISTRY: dict = {}


def _register_model(cls, children: tuple, aux: tuple = ()):
    MODEL_REGISTRY[cls.__name__] = (cls, children, aux)
    def flatten(m):
        return (tuple(getattr(m, f) for f in children),
                tuple(getattr(m, f) for f in aux))

    def unflatten(aux_vals, child_vals):
        m = object.__new__(cls)
        for f, v in zip(children, child_vals):
            object.__setattr__(m, f, v)
        for f, v in zip(aux, aux_vals):
            object.__setattr__(m, f, v)
        if cls is Mixture:
            object.__setattr__(m, "labels", None)
        return m

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def register_factor_model(cls, children: tuple = ("Z",), aux: tuple = ()):
    """Register a user-defined :class:`FactorModel` subclass so it flows
    through jit boundaries and packed serialization.

    The reference lets users define factors by subtyping
    ``AbstractManifoldMinimize`` + ``getSample``/functor methods (e.g.
    test/testCalcFactorHypos.jl:11-30, test/testSpecialSampler.jl); here a
    custom factor is a ``FactorModel`` subclass with ``sample``/``residual``
    (and ``sample_points`` for priors), registered once:

        class MyFactor(FactorModel):
            def __init__(self, Z): self.Z = Z
            @property
            def zdim(self): return self.Z.dim
            def sample(self, key, n): return self.Z.sample(key, (n,))
            def residual(self, z, x1, x2): return x2 - (x1 + z)
        register_factor_model(MyFactor)

    ``children`` are array-ish fields traced as pytree leaves; ``aux`` are
    static (hashable) fields baked into the compiled kernel signature.
    """
    return _register_model(cls, tuple(children), tuple(aux))


_register_model(Prior, ("Z",))
_register_model(LinearRelative, ("Z",))
_register_model(EuclidDistance, ("Z",))
_register_model(PriorCircular, ("Z",))
_register_model(CircularCircular, ("Z",))
_register_model(Mixture, ("mechanics", "components", "diversity"))
_register_model(PartialPrior, ("Z",), ("partial",))
_register_model(MsgPrior, ("belief", "ipc"), ("manifold",))
_register_model(MetaPrior, (), ("data",))
_register_model(GenericMarginal, ())
_register_model(ManifoldFactor, ("Z",), ("manifold",))
_register_model(ManifoldPrior, ("p0", "Z"), ("manifold",))


class GaussianJoint(FactorModel):
    """Joint Gaussian prior over several variables — the parametric tree
    message (reference LikelihoodMessage.cliqueLikelihood::MvNormal carried
    by the parametric CSM, src/parametric/services/ParametricCSMFunctions.jl
    :8-97 and calculateCoBeliefMessage, ParametricUtils.jl:744-796).

    residual = concat_v log(p0_v, x_v) − z with joint covariance ``cov``
    over the stacked tangent dims.
    """

    def __init__(self, manifolds, p0s, cov):
        self.manifolds = tuple(manifolds)
        self.p0s = tuple(jnp.asarray(p) for p in p0s)
        self.cov = jnp.asarray(cov, jnp.float32)

    @property
    def zdim(self):
        return sum(m.dof for m in self.manifolds)

    def sample(self, key, n):
        L = jnp.linalg.cholesky(self.cov + 1e-9 * jnp.eye(self.zdim))
        return (jax.random.normal(key, (n, self.zdim)) @ L.T)

    def residual(self, meas, *points):
        logs = [m.log(p0, x) for m, p0, x in
                zip(self.manifolds, self.p0s, points)]
        return jnp.concatenate(logs, axis=-1) - meas

    def mean_cov(self):
        return jnp.zeros((self.zdim,)), self.cov


_register_model(GaussianJoint, ("p0s", "cov"), ("manifolds",))


class MsgRelativeLikelihood(FactorModel):
    """Relative likelihood carried inside a joint up-message: the measured
    quantity is the tangent difference log(x1⁻¹∘x2), with a particle belief
    over it obtained by deconvolving the solved child clique (reference
    addLikelihoodsDifferentialCHILD!, TreeMessageUtils.jl:279-335 — the
    `useMsgLikelihoods` joint/differential up-message path)."""

    def __init__(self, belief, manifold):
        self.belief = belief        # Belief over tangent differences
        self.manifold = manifold

    @property
    def zdim(self):
        return self.manifold.dof

    def sample(self, key, n):
        from ..beliefs import kde_sample
        from .factors import FactorModel  # noqa: F401
        # differences live in a Euclidean chart of the tangent space
        from ..manifolds import Euclidean
        return kde_sample(Euclidean(self.manifold.dof), self.belief, key, n)

    def residual(self, meas, p1, p2):
        return self.manifold.log(p1, p2) - meas

    def mean_cov(self):
        from ..beliefs import mean_cov as bmc
        from ..manifolds import Euclidean
        return bmc(Euclidean(self.manifold.dof), self.belief.points)


_register_model(MsgRelativeLikelihood, ("belief",), ("manifold",))
