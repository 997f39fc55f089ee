"""Product of KDE beliefs on a manifold — exact cascaded-pair kernel.

TPU-native rebuild of ApproxManifoldProducts.jl's ``manifoldProduct`` (the
reference's single most load-bearing external call, used at every belief
update: src/services/GraphProductOperations.jl:16-78).

Algorithm.  Each belief is a Gaussian mixture with N kernels and one
diagonal bandwidth per density.  The product of two such mixtures is again
a Gaussian mixture whose N×N component weights are available in closed form:

    w[i,j] ∝ exp(-½ Σ_d (μA_id - μB_jd)² / (bwA_d² + bwB_d²))

so we sample ``n_out`` component *pairs* exactly from that dense weight
matrix (one fused VPU/MXU-shaped block per pair of densities), combine the
selected components analytically (precision-weighted means, summed
precisions), and cascade: the D-density product is D−1 exact pairwise
products carrying *component means + precisions* — points are only sampled
once at the very end.  Component subsampling to ``n_out`` per stage is the
only approximation.

Why not label-Gibbs (the classic NBP sampler used by AMP): cold-started
Gibbs label chains have absorbing disagreeing states (kernel pairs from
non-overlapping modes) which emit samples *between* modes; in the Bayes-tree
Gibbs loop those samples echo through relative factors and bootstrap false
modes.  The exact pair cascade has no such failure mode, costs one
(N_out × N) matrix per density, and is deterministic-shape for XLA.

Partial proposals (factors constraining a dim subset,
src/services/ApproxConv.jl:4-45) carry zero precision on unconstrained dims;
dims with zero total precision fall back to the previous belief's points.
Curvature: products run in the tangent space at the Karcher mean of the
pooled proposal particles (exact for Euclidean/Circle; standard
linearization for SE(n)).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..manifolds import Manifold

__all__ = ["manifold_product", "Proposal", "pair_product_tangent",
           "product_cascade_tangent"]


class Proposal:
    """One input density to a product: particle points, per-dim tangent
    bandwidth, and a per-dim constraint mask (False = this proposal does not
    constrain that dim — partial factor)."""

    def __init__(self, points: jnp.ndarray, bw: jnp.ndarray,
                 dim_mask: jnp.ndarray | None = None):
        self.points = points
        self.bw = bw
        self.dim_mask = (jnp.ones(bw.shape[-1], bool)
                         if dim_mask is None else jnp.asarray(dim_mask, bool))


def _pair_logW(muA, precA, muB, precB):
    """Agreement log-weights in MXU-friendly matmul form.

    In the cascade the *incoming* density B always has one shared diagonal
    precision across its kernels, so the effective inverse variance
    ivar = pA·pB/(pA+pB) depends only on (component-of-A, dim).  Then

      Σ_d ivar_id (a_id − b_jd)²
        = Σ_d ivar a²  (per-row)  +  ivar · (b²)ᵀ  −  2 (ivar⊙a) · bᵀ

    — two thin matmuls instead of an (Na, Nb, dof) broadcast tensor: the
    product weight matrix rides the MXU and HBM traffic stays O(N·dof + N²).
    """
    pB0 = precB[0]                                          # shared row
    both = (precA > 0) & (pB0[None, :] > 0)
    ivar = jnp.where(both, precA * pB0 / jnp.maximum(precA + pB0, 1e-30),
                     0.0)                                   # (Na, dof)
    a2 = jnp.sum(ivar * muA * muA, axis=-1)                 # (Na,)
    # HIGHEST: K=dof is tiny, so full-f32 matmuls are free — and they keep
    # this path bit-consistent with the Pallas kernel across dof values
    # (default MXU bf16 multiplies cost ~1e-2 absolute in logW)
    t2 = jnp.dot(ivar, (muB * muB).T,
                 precision=jax.lax.Precision.HIGHEST)       # (Na, Nb)
    t3 = jnp.dot(ivar * muA, muB.T,
                 precision=jax.lax.Precision.HIGHEST)       # (Na, Nb)
    return -0.5 * (a2[:, None] + t2 - 2.0 * t3)


@functools.partial(jax.jit, static_argnames=("n_out",))
def pair_product_tangent(muA: jnp.ndarray, precA: jnp.ndarray,
                         muB: jnp.ndarray, precB: jnp.ndarray,
                         key, n_out: int):
    """Exact product of two diagonal-Gaussian mixtures in tangent coords.

    muA: (Na, dof) component means with per-component diag precisions
    precA: (Na, dof) (0 ⇒ dim unconstrained by that component); ``precB``
    must share one precision row across components (true throughout the
    cascade — fresh proposals have per-density uniform bandwidths).
    Returns (mu, prec) of ``n_out`` exactly-sampled product components.

    Sampling is two-stage (row ∝ row-logsumexp, then column | row) so the
    cost is O(Na·Nb) once plus O(n_out·Nb) — no flattened N² categorical.
    """
    logW = _pair_logW(muA, precA, muB, precB)               # (Na, Nb)
    na, nb = logW.shape

    k_row, k_col = jax.random.split(key)
    row_ls = jax.scipy.special.logsumexp(logW, axis=1)      # (Na,)
    ia = jax.random.categorical(k_row, row_ls, shape=(n_out,))
    # all index selections as one-hot matmuls: data-dependent gathers
    # compile pathologically on the TPU backend
    selA = jax.nn.one_hot(ia, na, dtype=muA.dtype)          # (n_out, Na)
    ib = jax.random.categorical(k_col, selA @ logW, axis=-1)
    selB = jax.nn.one_hot(ib, nb, dtype=muB.dtype)

    sA, sB = selA @ muA, selB @ muB
    qA, qB = selA @ precA, selB @ precB
    prec = qA + qB
    mu = jnp.where(prec > 0, (qA * sA + qB * sB) /
                   jnp.maximum(prec, 1e-30), 0.0)
    return mu, prec


# ---------------------------------------------------------------------------
# subquadratic path: cluster-condense the incoming density, then the exact
# cascade runs at O(N·k) instead of O(N²) (VERDICT r3 item 3 — the role of
# the reference's multiscale ball-tree KDE, KernelDensityEstimate.jl via
# AMP manifoldProduct, src/services/GraphProductOperations.jl:53)
# ---------------------------------------------------------------------------

#: incoming densities with more kernels than this are condensed before the
#: pair product; the exact path remains the default at the reference's
#: operating sizes (N <= ~512 measured cheaper exact on v5e — the N²
#: weight matrix is still tiny there)
CONDENSE_MIN_NB = 768
#: cluster count of the condensed mixture.  Accuracy: with N >> k the
#: within-cluster spread is far below the kernel bandwidth (1-D spacing
#: ~ sigma·k/N per cluster), and the condensed covariance folds that
#: spread in exactly (bw² + within-var), so mode placement and mass are
#: preserved to well under the sampling noise at n_out draws.
CONDENSE_K = 256
_CONDENSE_ITERS = 6


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def condense_mixture(mu: jnp.ndarray, prec: jnp.ndarray, key,
                     k: int, iters: int = _CONDENSE_ITERS):
    """Condense an (N, dof) kernel mixture with a SHARED precision row to a
    k-component weighted mixture: Lloyd iterations in pure matmul form
    (assignment via a distance matrix, update via one-hot matmuls — no
    data-dependent gathers), covariance-preserving (cluster variance adds
    to the kernel variance), counts as log-weights.

    Returns (centroids (k, dof), condensed precisions (k, dof),
    log-weights (k,)).
    """
    n, d = mu.shape
    lam = prec[0]                                   # shared kernel row
    # cluster only over constrained dims (partial proposals carry junk on
    # zero-precision dims)
    w = (lam > 0).astype(mu.dtype)
    x = mu * w
    # strided init — particle order is already exchangeable, and a
    # random.permutation here is a device SORT (bitonic, ms-class at
    # N=2048) inside every fused update
    del key
    stride = max(1, n // k)
    c = x[::stride][:k]
    if c.shape[0] < k:                              # n not divisible
        c = jnp.concatenate([c, x[:k - c.shape[0]]], axis=0)

    def assign(c):
        d2 = (jnp.sum(x * x, 1)[:, None] - 2.0 * jnp.dot(
            x, c.T, precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(c * c, 1)[None, :])                    # (n, k)
        return jax.nn.one_hot(jnp.argmin(d2, axis=1), k, dtype=mu.dtype)

    def body(c, _):
        A = assign(c)
        cnt = jnp.sum(A, axis=0)
        c2 = jnp.where(cnt[:, None] > 0,
                       jnp.dot(A.T, x,
                               precision=jax.lax.Precision.HIGHEST)
                       / jnp.maximum(cnt[:, None], 1.0), c)
        return c2, None

    # unrolled Lloyd iterations: on the axon runtime each scan iteration
    # pays ~25 us fixed launch overhead (round-5 region cost model,
    # benchmarks/update_parts.py) and the body is two matmul regions
    for _ in range(iters):
        c, _ = body(c, None)
    A = assign(c)                                            # final stats
    cnt = jnp.sum(A, axis=0)
    s1 = jnp.dot(A.T, mu, precision=jax.lax.Precision.HIGHEST)
    s2 = jnp.dot(A.T, mu * mu, precision=jax.lax.Precision.HIGHEST)
    mean = s1 / jnp.maximum(cnt[:, None], 1.0)
    var = jnp.maximum(s2 / jnp.maximum(cnt[:, None], 1.0) - mean * mean,
                      0.0)
    prec_c = jnp.where(lam[None, :] > 0,
                       1.0 / (1.0 / jnp.maximum(lam[None, :], 1e-30) + var),
                       0.0)
    # dead clusters get a large FINITE negative weight, not -inf: the
    # column draw downstream runs as a one-hot matmul (selA @ logW), and
    # 0 * -inf = NaN would poison every logit row
    logw = jnp.where(cnt > 0, jnp.log(jnp.maximum(cnt, 1.0)), -1e30)
    return mean, prec_c, logw


@functools.partial(jax.jit, static_argnames=("n_out",))
def pair_product_tangent_weighted(muA, precA, muB, precB, logwB, key,
                                  n_out: int):
    """Exact pair product against a WEIGHTED mixture with per-component
    precisions (the condensed form).  Nb here is the small cluster count,
    so the (Na, Nb, dof) broadcast is cheap — this generality is exactly
    what the thin-matmul `_pair_logW` trades away at full N."""
    def logits_vs_B(mu_rows, prec_rows):
        """(R, Nb) pair log-weights of the given rows against all of B —
        O(R·Nb·dof) broadcast, cheap because Nb is the cluster count."""
        pa, pb = prec_rows[:, None, :], precB[None, :, :]
        both = (pa > 0) & (pb > 0)
        ivar = jnp.where(both, pa * pb / jnp.maximum(pa + pb, 1e-30), 0.0)
        diff = mu_rows[:, None, :] - muB[None, :, :]
        return -0.5 * jnp.sum(ivar * diff * diff, axis=-1) + logwB[None, :]

    na, nb = muA.shape[0], muB.shape[0]
    k_row, k_col = jax.random.split(key)
    row_ls = jax.scipy.special.logsumexp(logits_vs_B(muA, precA), axis=1)
    ia = jax.random.categorical(k_row, row_ls, shape=(n_out,))
    selA = jax.nn.one_hot(ia, na, dtype=muA.dtype)
    sA, qA = selA @ muA, selA @ precA
    # recompute the SELECTED rows' logits directly instead of selA @ logW:
    # that matmul is O(n_out·Na·Nb) — the one quadratic-in-N cost left in
    # the condensed path (1 G MAC at N=2048) — while the rebuild is
    # O(n_out·Nb·dof)
    ib = jax.random.categorical(k_col, logits_vs_B(sA, qA), axis=-1)
    selB = jax.nn.one_hot(ib, nb, dtype=muB.dtype)

    sB, qB = selB @ muB, selB @ precB
    prec = qA + qB
    mu = jnp.where(prec > 0, (qA * sA + qB * sB) /
                   jnp.maximum(prec, 1e-30), 0.0)
    return mu, prec


def product_cascade_tangent(tangs, precs, key, n_out: int):
    """Cascade exact pairwise products over D densities.

    tangs: list of (N_j, dof) kernel means; precs: list of (N_j, dof)
    per-kernel precisions.  Returns sampled points (n_out, dof) and the
    per-dim total precision indicator.

    Incoming densities with > CONDENSE_MIN_NB kernels are condensed to
    CONDENSE_K weighted clusters first, making each stage O(N·k); the
    exact quadratic path remains the default at reference sizes and the
    Pallas streaming kernel still serves the huge-N regime where even
    condensation's row side would not fit XLA limits.
    """
    keys = jax.random.split(key, 2 * len(tangs))
    mu, prec = tangs[0], precs[0]
    noise_key = keys[0]
    if mu.shape[0] != n_out and len(tangs) == 1:
        # single density: subsample kernels uniformly (one-hot matmul).
        # keys[0] picks the kernels, so the final within-kernel noise must
        # use a DERIVED key — reusing keys[0] couples selection and noise
        # (fold_in keeps the other streams untouched, so only this branch
        # re-rolls)
        sel = jax.nn.one_hot(
            jax.random.randint(keys[0], (n_out,), 0, mu.shape[0]),
            mu.shape[0], dtype=mu.dtype)
        # HIGHEST: default MXU precision would bf16-round the selected
        # VALUES (the one-hot side is exact either way)
        mu = jnp.dot(sel, mu, precision=jax.lax.Precision.HIGHEST)
        prec = jnp.dot(sel, prec, precision=jax.lax.Precision.HIGHEST)
        noise_key = jax.random.fold_in(keys[0], 1)
    for j in range(1, len(tangs)):
        nb = tangs[j].shape[0]
        if nb >= CONDENSE_MIN_NB and \
                mu.shape[0] * nb < LARGE_PAIR_THRESHOLD:
            cB, pB, lwB = condense_mixture(tangs[j], precs[j],
                                           keys[len(tangs) + j],
                                           k=min(CONDENSE_K, nb))
            mu, prec = pair_product_tangent_weighted(
                mu, prec, cB, pB, lwB, keys[j], n_out)
        elif mu.shape[0] * nb >= LARGE_PAIR_THRESHOLD:
            mu, prec = pair_product_tangent_large(
                mu, prec, tangs[j], precs[j], keys[j], n_out,
                interpret=jax.default_backend() == "cpu")
        else:
            mu, prec = pair_product_tangent(mu, prec, tangs[j], precs[j],
                                            keys[j], n_out)
    # final: one draw inside each selected product component
    noise = jax.random.normal(noise_key, mu.shape) / \
        jnp.sqrt(jnp.maximum(prec, 1e-30))
    samples = jnp.where(prec > 0, mu + noise, 0.0)
    return samples, prec


def manifold_product(manifold: Manifold, proposals: Sequence[Proposal],
                     key, n_out: int, old_points: jnp.ndarray | None = None,
                     sweeps: int = 0) -> jnp.ndarray:
    """Product of proposal densities → ``n_out`` particle points.

    Mirrors ``propagateBelief``'s call into AMP.manifoldProduct
    (src/services/GraphProductOperations.jl:53): ``old_points`` supplies
    values for dims no proposal constrains.  ``sweeps`` is accepted for
    API parity (the exact cascade needs no Gibbs sweeps).
    """
    D = len(proposals)
    if D == 0:
        if old_points is None:
            raise ValueError("empty product with no fallback points")
        return old_points

    if D == 1 and bool(jnp.all(proposals[0].dim_mask)):
        # single full proposal: the product is the proposal itself
        return proposals[0].points[:n_out]

    pooled = jnp.concatenate([p.points for p in proposals], axis=0)
    ref = manifold.mean(pooled)

    tangs, precs = [], []
    for p in proposals:
        t = manifold.log(ref[None, :], p.points)            # (N_j, dof)
        lam = jnp.where(p.dim_mask, 1.0 / jnp.maximum(p.bw**2, 1e-12), 0.0)
        tangs.append(t)
        precs.append(jnp.broadcast_to(lam, t.shape))
    samples, prec = product_cascade_tangent(tangs, precs, key, n_out)

    if old_points is not None:
        unconstrained = jnp.max(jnp.stack(
            [jnp.max(q, axis=0) for q in precs]), axis=0) <= 0
        if bool(jnp.any(unconstrained)):
            old_t = manifold.log(ref[None, :], old_points[:n_out])
            samples = jnp.where(unconstrained[None, :], old_t, samples)
    return manifold.exp(jnp.broadcast_to(ref, (n_out,) + ref.shape), samples)


# Threshold (Na·Nb pair count) above which the pair product routes through
# the Pallas streaming kernel instead of the plain-XLA path.  Set from
# MEASURED perf data on TPU v5e (2026-08-21,
# benchmarks/pallas_crossover.py, dof=3, completion-synced timings):
#
#   pairs    2^26   2^28   2^29   2^30   2^31(49k²) 2^31(57k²)  2^32
#   xla      34ms   33ms   43ms   54ms   91ms       112ms       compile FAIL
#   pallas   38ms   39ms   44ms   53ms   83ms       100ms       130ms
#
# The HBM-streaming kernel crosses under the XLA fused path at ~2^30 pairs
# and is the ONLY working path at Na·Nb >= 2^32 (tpu_compile_helper
# element-count overflow at 65536²).  Below 2^30 XLA's fusion wins by
# ~10%.  (A round-1 note claimed the compiled kernel "hangs at small
# feature dims on real TPU"; that hang was reproduced and bisected to the
# tunnel's device→host transfer path stalling — the kernel itself
# dispatches and completes fine.)
LARGE_PAIR_THRESHOLD = 1 << 30

# Block size for the chunked selection inside the large-pair path: peak
# memory is 2·BLOCK·max(Na, Nb) floats (vs n_out·Na for the naive one-hot,
# which at N=50k would be ~10 GB and OOM the chip).
_LARGE_SEL_BLOCK = 2048


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def pair_product_tangent_large(muA: jnp.ndarray, precA: jnp.ndarray,
                               muB: jnp.ndarray, precB: jnp.ndarray,
                               key, n_out: int, interpret: bool = False):
    """Large-N exact pair product that never materializes the (Na, Nb)
    weight matrix: row log-partitions stream through the Pallas kernel
    (ops/kernels/pallas_product.py), then the ``n_out`` selected rows'
    weights are rebuilt blockwise for the column draw — peak memory
    O(BLOCK·max(Na, Nb)) instead of O(n_out·Na), so belief products at
    N=50k fit on one chip.
    """
    from .kernels.pallas_product import pair_row_logsumexp

    na, nb = muA.shape[0], muB.shape[0]
    row_ls = pair_row_logsumexp(muA, precA, muB, precB,
                                interpret=interpret)        # (Na,)
    k_row, k_col = jax.random.split(key)
    ia = jax.random.categorical(k_row, row_ls, shape=(n_out,))

    blk = min(_LARGE_SEL_BLOCK, n_out)
    pad = (-n_out) % blk
    ia_b = jnp.reshape(jnp.concatenate([ia, ia[:pad]]) if pad else ia,
                       (-1, blk))
    keys_b = jax.random.split(k_col, ia_b.shape[0])

    def one_block(args):
        ia_blk, kc = args
        selA = jax.nn.one_hot(ia_blk, na, dtype=muA.dtype)  # (blk, Na)
        muA_s = selA @ muA
        precA_s = selA @ precA
        logW_rows = _pair_logW(muA_s, precA_s, muB, precB)  # (blk, Nb)
        ib = jax.random.categorical(kc, logW_rows, axis=-1)
        selB = jax.nn.one_hot(ib, nb, dtype=muB.dtype)
        sB = selB @ muB
        qB = selB @ precB
        prec = precA_s + qB
        mu = jnp.where(prec > 0, (precA_s * muA_s + qB * sB) /
                       jnp.maximum(prec, 1e-30), 0.0)
        return mu, prec

    mu_b, prec_b = jax.lax.map(one_block, (ia_b, keys_b))
    mu = jnp.reshape(mu_b, (-1, muA.shape[1]))[:n_out]
    prec = jnp.reshape(prec_b, (-1, muA.shape[1]))[:n_out]
    return mu, prec
