"""Particle/KDE beliefs on manifolds.

TPU-native replacement for the reference's ManifoldKernelDensity /
``TreeBelief`` (reference: src/entities/BeliefTypes.jl:23-57) and the
ball-tree KDE machinery it gets from KernelDensityEstimate.jl.  A belief is a
fixed-shape particle array plus a diagonal tangent-space bandwidth — exactly
the layout that maps onto batched XLA kernels and ICI collectives
(SURVEY.md §2.9.5).

Every routine is pure and jit-friendly; bandwidth selection is Silverman's
rule in the tangent space at the Karcher mean (the reference delegates to
KDE.jl's LOO-CV; Silverman matches its statistical role at N≈100).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .manifolds import Manifold


class Belief(NamedTuple):
    """KDE belief: ``points`` (N, point_dim), ``bw`` (dof,) 1-sigma tangent
    bandwidths, ``ipc`` infoPerCoord (dof,) (reference TreeBelief fields
    val/bw/infoPerCoord, BeliefTypes.jl:23-34)."""

    points: jnp.ndarray
    bw: jnp.ndarray
    ipc: jnp.ndarray

    @property
    def n(self) -> int:
        return self.points.shape[0]


def silverman_bw(manifold: Manifold, points: jnp.ndarray,
                 floor: float = 1e-4) -> jnp.ndarray:
    """Per-dimension Silverman bandwidth in the tangent space at the mean."""
    n = points.shape[0]
    mu = manifold.mean(points)
    X = manifold.log(mu[None, :], points)              # (N, dof)
    sd = jnp.std(X, axis=0)
    d = X.shape[-1]
    factor = (4.0 / ((d + 2.0) * n)) ** (1.0 / (d + 4.0))
    return jnp.maximum(sd * factor, floor)


import functools

# LOO bandwidth selection becomes subset-based above this many points
# (pairwise matrix memory: 4096^2 * 4 B = 67 MB vs 10 GB at 50k)
# LOO scale selection subsamples above this: the grid search only corrects
# mode-vs-global spread, which a few hundred points resolve; the
# n-dependence stays in the full-N Silverman base.  (Was 4096; the
# (n_grid, M, M) element volume per belief write made bandwidth selection
# the top compute consumer of large-N solves — 24 x 2048² = 100 M
# elements at M=2048, ~1-2 ms per write x ~150 writes/solve.)
_LOO_MAX_POINTS = 512


@functools.partial(jax.jit, static_argnames=("manifold", "n_grid"))
def loo_bandwidth(manifold: Manifold, points: jnp.ndarray,
                  n_grid: int = 24) -> jnp.ndarray:
    """Leave-one-out max-likelihood bandwidth (diagonal, shared scale).

    The reference's KDE.jl picks bandwidths by LOO cross-validation — the
    property MM-iSAM depends on: for well-separated multimodal particle
    clouds the bandwidth tracks the *within-mode* spread, not the global
    std (Silverman's rule oversmooths by ~the mode separation and destroys
    mode discrimination in belief products).

    Parameterised as ``bw = s · bw_silverman`` with the scalar ``s`` swept
    over a log grid; the LOO log-likelihood for every candidate reuses one
    pairwise distance matrix, so the whole selection is two batched matmul-
    shaped ops — TPU-friendly, no iterative optimiser.
    """
    n = points.shape[0]
    mu = manifold.mean(points)
    X = manifold.log(mu[None, :], points)                    # (N, dof)
    sd = jnp.std(X, axis=0)
    d = X.shape[-1]
    factor = (4.0 / ((d + 2.0) * n)) ** (1.0 / (d + 4.0))
    bw0 = jnp.maximum(sd * factor, 1e-5)                     # Silverman base

    # the pairwise matrix is O(N^2) memory — at N=50k that is 10 GB and
    # OOMs the chip.  Above the cap, select the scale on a uniform-stride
    # subset: the grid search corrects mode-vs-global spread, which a few
    # thousand points resolve; the n-dependence stays in the full-N
    # Silverman base.
    m = n
    if n > _LOO_MAX_POINTS:
        stride = -(-n // _LOO_MAX_POINTS)
        X = X[::stride][:_LOO_MAX_POINTS]
        m = X.shape[0]

    Z = X / bw0
    z2 = jnp.sum(Z * Z, axis=-1)                             # (M,)
    # matmul form |zi|^2 + |zj|^2 - 2 zi.zj: no (M, M, dof) broadcast
    D2 = z2[:, None] + z2[None, :] - 2.0 * jnp.dot(
        Z, Z.T, precision=jax.lax.Precision.HIGHEST)
    D2 = jnp.maximum(D2, 0.0) + jnp.eye(m) * 1e12            # mask self

    scales = jnp.logspace(-1.5, 0.3, n_grid)                 # s candidates

    def loo_ll(s):
        logk = -0.5 * D2 / (s * s)
        ll = jax.scipy.special.logsumexp(logk, axis=1)
        return jnp.sum(ll) - m * d * jnp.log(s)

    lls = jax.vmap(loo_ll)(scales)
    s_best = scales[jnp.argmax(lls)]
    return s_best * bw0


#: shared unit infoPerCoord vectors keyed by (dof, dtype) — every belief
#: write with default ipc otherwise pays one eager device op (immutable,
#: so sharing is safe; measurable on tunneled-TPU graph construction)
_IPC_ONES: dict = {}


def make_belief(manifold: Manifold, points: jnp.ndarray,
                bw: jnp.ndarray | None = None,
                ipc: jnp.ndarray | None = None) -> Belief:
    """Build a ``Belief`` from a particle array: LOO bandwidth selection
    when ``bw`` is omitted (reference TreeBelief/manikde! construction,
    src/entities/BeliefTypes.jl:23-34)."""
    if bw is None:
        bw = loo_bandwidth(manifold, points)
    if ipc is None:
        k = (int(manifold.dof), str(points.dtype))
        ipc = _IPC_ONES.get(k)
        if ipc is None:
            ipc = _IPC_ONES[k] = jnp.ones((manifold.dof,), points.dtype)
    return Belief(points=points, bw=jnp.asarray(bw), ipc=jnp.asarray(ipc))


def kde_logpdf(manifold: Manifold, belief: Belief,
               query: jnp.ndarray) -> jnp.ndarray:
    """log p(query) under the Gaussian-kernel KDE.  query: (Q, point_dim)."""
    X = manifold.log(belief.points[None, :, :], query[:, None, :])  # (Q,N,dof)
    z = X / belief.bw
    logk = -0.5 * jnp.sum(z * z, axis=-1)                           # (Q, N)
    lognorm = (jnp.sum(jnp.log(belief.bw))
               + 0.5 * belief.bw.shape[-1] * jnp.log(2.0 * jnp.pi))
    n = belief.points.shape[0]
    return jax.scipy.special.logsumexp(logk, axis=-1) - jnp.log(float(n)) - lognorm


def kde_sample(manifold: Manifold, belief: Belief, key, n: int) -> jnp.ndarray:
    """Draw n samples from the KDE (uniform kernel choice + tangent noise).
    Kernel selection is a one-hot matmul — data-dependent gathers compile
    pathologically on the TPU backend."""
    kidx, knoise = jax.random.split(key)
    idx = jax.random.randint(kidx, (n,), 0, belief.points.shape[0])
    sel = jax.nn.one_hot(idx, belief.points.shape[0],
                         dtype=belief.points.dtype)
    centers = sel @ belief.points
    X = belief.bw * jax.random.normal(knoise, (n, belief.bw.shape[-1]))
    return manifold.exp(centers, X)


def mean_cov(manifold: Manifold, points: jnp.ndarray):
    """On-manifold mean and tangent-space covariance
    (reference: src/services/VariableStatistics.jl calcMeanCovar)."""
    mu = manifold.mean(points)
    X = manifold.log(mu[None, :], points)
    cov = (X.T @ X) / jnp.maximum(points.shape[0] - 1, 1)
    return mu, cov


@functools.partial(jax.jit, static_argnames=("manifold",))
def _ppe_core(manifold: Manifold, points: jnp.ndarray, bw: jnp.ndarray):
    mu = manifold.mean(points)
    belief = Belief(points=points, bw=bw, ipc=bw)
    lp = kde_logpdf(manifold, belief, points)
    sel = (lp == jnp.max(lp)).astype(points.dtype)
    pmax = (sel[:, None] * points).sum(0) / jnp.maximum(sel.sum(), 1.0)
    return mu, pmax


def is_partial(belief: Belief) -> bool:
    """Whether the belief constrains only a subset of tangent dims — some
    infoPerCoord entries are zero (reference isPartial on beliefs,
    test/testpartialconstraint.jl:106)."""
    import numpy as _np
    ipc = _np.asarray(belief.ipc)
    return bool((ipc <= 0).any())


@functools.partial(jax.jit, static_argnames=("manifold",))
def _ppe_core_batched(manifold: Manifold, pts_tuple, bw_tuple):
    # stack AND unstack inside the trace: eager stacks/slices outside the
    # jit each cost a device round-trip (expensive behind the TPU tunnel)
    points = jnp.stack(pts_tuple)
    bw = jnp.stack(bw_tuple)
    mus, pmaxs = jax.vmap(_ppe_core, in_axes=(None, 0, 0))(
        manifold, points, bw)
    k = len(pts_tuple)
    return tuple(mus[i] for i in range(k)), \
        tuple(pmaxs[i] for i in range(k))


def ppe_batched(manifold: Manifold, beliefs):
    """calcPPE for several same-shape beliefs in ONE device call — the
    per-clique frontal write-back otherwise costs one dispatch per variable
    (transferUpdateSubGraph!, SubGraphFunctions.jl:131+)."""
    for b in beliefs:
        sh = getattr(b.points, "sharding", None)
        if sh is not None and len(getattr(sh, "device_set", ())) > 1:
            # stacking multi-device-sharded arrays corrupts/aborts XLA:CPU
            # (same hazard as the guard in ppe()) — take the safe
            # one-at-a-time path, which localizes each block first
            return [ppe(manifold, b) for b in beliefs]
    mus, pmaxs = _ppe_core_batched(manifold,
                                   tuple(b.points for b in beliefs),
                                   tuple(b.bw for b in beliefs))
    return [{"mean": mu, "max": pm, "suggested": pm}
            for mu, pm in zip(mus, pmaxs)]


class LazyPPE(dict):
    """calcPPE result computed on first access.

    The reference computes MeanMaxPPE eagerly at updateFromSubgraph
    (setVariablePosteriorEstimates!); here the values are identical but the
    device call is deferred until someone reads the estimate — incremental
    re-solve loops that never inspect PPEs then pay zero dispatches for
    them (each dispatch costs a round trip behind the TPU tunnel)."""

    def __init__(self, manifold: Manifold, belief: Belief):
        super().__init__()
        self._manifold = manifold
        self._belief = belief
        self._done = False

    def _force(self):
        if not self._done:
            self.update(ppe(self._manifold, self._belief))
            self._done = True

    def __getitem__(self, k):
        self._force()
        return super().__getitem__(k)

    def get(self, k, default=None):
        self._force()
        return super().get(k, default)

    def __contains__(self, k):
        self._force()
        return super().__contains__(k)

    def __iter__(self):
        self._force()
        return super().__iter__()

    def keys(self):
        self._force()
        return super().keys()

    def items(self):
        self._force()
        return super().items()

    def values(self):
        self._force()
        return super().values()

    def __len__(self):
        self._force()
        return super().__len__()

    def __repr__(self):
        self._force()
        return dict.__repr__(self)

    def __eq__(self, other):
        self._force()
        return dict.__eq__(self, other)

    __hash__ = None

    def __reduce__(self):             # pickle/deepcopy materialize
        self._force()
        return (dict, (dict(self),))


def ppe(manifold: Manifold, belief: Belief):
    """Posterior point estimates (reference calcPPE → MeanMaxPPE,
    src/services/FGOSUtils.jl:237-274): suggested=max-density particle,
    mean=Karcher mean, max=argmax of KDE over own particles."""
    pts = belief.points
    # eager indexing on a multi-device-sharded array hard-aborts on
    # XLA:CPU — pull the (small) particle block local first
    sh = getattr(pts, "sharding", None)
    if sh is not None and len(getattr(sh, "device_set", ())) > 1:
        import numpy as _np
        pts = jnp.asarray(_np.asarray(pts))
    mu, pmax = _ppe_core(manifold, pts, belief.bw)
    return {"mean": mu, "max": pmax, "suggested": pmax}


def spread_estimate(manifold: Manifold, points_a: jnp.ndarray,
                    points_b: jnp.ndarray) -> jnp.ndarray:
    """Mean pairwise distance proxy between two particle clouds — drives the
    entropy-inflation spread (reference calcVariableDistanceExpectedFractional,
    src/services/EvalFactor.jl:34-76)."""
    mu_a = manifold.mean(points_a)
    d = manifold.dist(mu_a[None, :], points_b)
    return jnp.mean(d) + jnp.std(d)
