"""Product of KDE beliefs on a manifold — batched parallel-Gibbs kernel.

TPU-native rebuild of ApproxManifoldProducts.jl's ``manifoldProduct`` (the
reference's single most load-bearing external call, used at every belief
update: src/services/GraphProductOperations.jl:16-78).  The algorithm is the
classic parallel Gibbs label sampler for products of Gaussian mixtures
(Ihler et al., "Efficient Multiscale Sampling from Products of Gaussian
Mixtures"; see also PAPERS.md pull-message-passing): every output particle
independently Gibbs-samples one kernel label per input density, then draws
from the resulting product Gaussian.

TPU mapping: all ``n_out`` output particles run their Gibbs chains in
lock-step as one batched computation — the per-density weight matrix is an
``(n_out, N_j)`` dense block, so the whole product is a handful of fused
VPU/MXU ops instead of the reference's per-particle tree walks.

Partial proposals (factors constraining a dim subset,
src/services/ApproxConv.jl:4-45 partial handling) enter with zero precision
on unconstrained dims; dims with zero *total* precision across all proposals
fall back to the previous belief's particles.

Curvature: products run in the tangent space at the Karcher mean of the
pooled proposal particles — exact for Euclidean/Circle (modulo wrap), the
standard linearization for SE(n) (beliefs are kernel-concentrated).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from ..manifolds import Manifold

__all__ = ["manifold_product", "Proposal", "gibbs_product_tangent"]


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


@functools.partial(jax.jit, static_argnames=("n_out", "sweeps"))
def gibbs_product_tangent(tang: jnp.ndarray, prec: jnp.ndarray,
                          valid: jnp.ndarray, key, n_out: int,
                          sweeps: int = 3):
    """Label-Gibbs product of D Gaussian mixtures in a shared tangent space.

    Args:
      tang:  (D, Nmax, dof) kernel centers (tangent coords at the ref point).
      prec:  (D, dof) per-density diagonal kernel precisions (0 = dim unused).
      valid: (D, Nmax) kernel validity mask (padding for ragged densities).
      n_out: number of output samples.
      sweeps: Gibbs sweeps over densities.

    Returns: (n_out, dof) tangent samples + (dof,) total precision.
    """
    D, Nmax, dof = tang.shape
    ktotal = jnp.sum(prec, axis=0)                       # (dof,)

    k_init, k_scan, k_final = jax.random.split(key, 3)

    # initial labels: uniform over valid kernels per density
    logv = jnp.where(valid, 0.0, -jnp.inf)               # (D, Nmax)
    init_labels = jax.random.categorical(
        k_init, logv[:, None, :], axis=-1,
        shape=(D, n_out))                                # (D, n_out)

    def selected_sum(labels):
        """Sum_j prec_j * mu_{j, l_j} for each output particle: (n_out, dof)."""
        sel = jnp.take_along_axis(
            tang, labels[:, :, None], axis=1)            # (D, n_out, dof)
        return jnp.sum(prec[:, None, :] * sel, axis=0), sel

    def sweep(labels, skey):
        skeys = jax.random.split(skey, D)

        def per_density(j, labels):
            wsum, sel = selected_sum(labels)
            # leave-one-out product of the other densities
            lam_out = ktotal - prec[j]                            # (dof,)
            m_num = wsum - prec[j] * sel[j]                        # (n_out, dof)
            lam_safe = jnp.maximum(lam_out, 1e-12)
            m_out = m_num / lam_safe
            # weight of candidate kernel l: N(mu_jl; m_out, 1/lam_out + bw_j^2)
            lam_eff = jnp.where(
                lam_out > 1e-12,
                1.0 / (1.0 / lam_safe + 1.0 / jnp.maximum(prec[j], 1e-12)),
                0.0)                                               # (dof,)
            diff = tang[j][None, :, :] - m_out[:, None, :]         # (n_out,Nmax,dof)
            logw = -0.5 * jnp.sum(lam_eff * diff * diff, axis=-1)  # (n_out,Nmax)
            logw = jnp.where(valid[j][None, :], logw, -jnp.inf)
            new_l = jax.random.categorical(skeys[j], logw, axis=-1)
            return labels.at[j].set(new_l)

        return jax.lax.fori_loop(
            0, D, lambda j, ls: per_density(j, ls), labels), None

    labels, _ = jax.lax.scan(
        lambda ls, k: sweep(ls, k), init_labels,
        jax.random.split(k_scan, sweeps))

    # final draw from the full product Gaussian per output particle
    wsum, _ = selected_sum(labels)
    lam = jnp.maximum(ktotal, 1e-12)
    mean = wsum / lam
    noise = jax.random.normal(k_final, (n_out, dof)) / jnp.sqrt(lam)
    samples = jnp.where(ktotal[None, :] > 1e-12, mean + noise, 0.0)
    return samples, ktotal


def manifold_product(manifold: Manifold, proposals: Sequence[Proposal],
                     key, n_out: int, old_points: jnp.ndarray | None = None,
                     sweeps: int = 3) -> jnp.ndarray:
    """Product of proposal densities → ``n_out`` particle points.

    Mirrors ``propagateBelief``'s call into AMP.manifoldProduct
    (src/services/GraphProductOperations.jl:53): ``old_points`` supplies
    values for dims no proposal constrains.
    """
    D = len(proposals)
    if D == 0:
        if old_points is None:
            raise ValueError("empty product with no fallback points")
        return old_points

    if D == 1 and bool(jnp.all(proposals[0].dim_mask)):
        # single full proposal: the product is the proposal itself
        return proposals[0].points[:n_out]

    dof = manifold.dof
    pooled = jnp.concatenate([p.points for p in proposals], axis=0)
    ref = manifold.mean(pooled)

    nmax = max(p.points.shape[0] for p in proposals)
    tang, prec, valid = [], [], []
    for p in proposals:
        t = manifold.log(ref[None, :], p.points)          # (N_i, dof)
        n_i = t.shape[0]
        pad = nmax - n_i
        tang.append(jnp.pad(t, ((0, pad), (0, 0))))
        lam = jnp.where(p.dim_mask, 1.0 / jnp.maximum(p.bw**2, 1e-12), 0.0)
        prec.append(lam)
        valid.append(jnp.pad(jnp.ones((n_i,), bool), (0, pad)))
    tang = jnp.stack(tang)
    prec = jnp.stack(prec)
    valid = jnp.stack(valid)

    samples, ktotal = gibbs_product_tangent(
        tang, prec, valid, key, n_out=n_out, sweeps=sweeps)

    pts = manifold.exp(jnp.broadcast_to(ref, (n_out,) + ref.shape), samples)

    if old_points is not None:
        # dims untouched by every proposal keep their previous values
        unconstrained = ktotal <= 1e-12
        if bool(jnp.any(unconstrained)):
            old_t = manifold.log(ref[None, :], old_points[:n_out])
            merged = jnp.where(unconstrained[None, :], old_t, samples)
            pts = manifold.exp(
                jnp.broadcast_to(ref, (n_out,) + ref.shape), merged)
    return pts
