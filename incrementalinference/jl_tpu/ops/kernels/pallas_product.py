"""Pallas TPU kernel: tiled row-logsumexp of the pair-product weight matrix.

The belief-product cascade needs, for every kernel i of mixture A, the
log-partition log Σ_j exp(logW_ij) over mixture B's kernels (ops/product.py
two-stage sampling).  At production particle counts (N ≥ 4k; dense mapping
or long-horizon smoothing) materializing the (Na, Nb) weight matrix in HBM
costs N²·4 bytes of traffic each way; this kernel streams B through VMEM in
column tiles with an online (max, sumexp) reduction, so HBM traffic is
O(N·dof) and the inner product rides the MXU.

The small-N path stays in plain XLA (ops/product.py _pair_logW) — kernel
launch overhead would dominate below ~1k kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["row_logsumexp_pallas", "pair_row_logsumexp"]


def _row_lse_kernel(a2_ref, iva_ref, ivmuA_ref, muB_ref, muB2_ref, out_ref,
                    *, tn: int, nb: int):
    """One grid row-tile: online logsumexp over B column tiles.

    a2:    (TM, 1)   Σ_d ivar·a² per A kernel
    iva:   (TM, D)   ivar rows of A
    ivmuA: (TM, D)   ivar ⊙ muA rows
    muB:   (Nb, D)   all B kernel means (resident in VMEM)
    muB2:  (Nb, D)   muB elementwise squared
    out:   (TM, 1)   row logsumexp
    """
    tm = a2_ref.shape[0]
    num_tiles = pl.cdiv(nb, tn)

    def body(t, carry):
        m, s = carry                                  # (TM,1) running max/sum
        b = muB_ref[pl.ds(t * tn, tn), :]             # (TN, D)
        b2 = muB2_ref[pl.ds(t * tn, tn), :]
        # HIGHEST: default MXU precision multiplies in bf16, which costs
        # ~1e-2 absolute in logW (measured dof=1 vs the XLA K=1 outer
        # product, which stays f32); the kernel is HBM-bound, so the
        # 3-pass f32 matmul is free
        t2 = jnp.dot(iva_ref[:, :], b2.T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)     # (TM, TN)
        t3 = jnp.dot(ivmuA_ref[:, :], b.T,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        logw = -0.5 * (a2_ref[:, :] + t2 - 2.0 * t3)
        # mask padded columns of the last tile
        col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1) + t * tn
        logw = jnp.where(col < nb, logw, -jnp.inf)
        tile_max = jnp.max(logw, axis=1, keepdims=True)
        new_m = jnp.maximum(m, tile_max)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logw - new_m), axis=1, keepdims=True)
        return new_m, s

    init = (jnp.full((tm, 1), -jnp.inf, jnp.float32),
            jnp.zeros((tm, 1), jnp.float32))
    m, s = jax.lax.fori_loop(0, num_tiles, body, init)
    out_ref[:, :] = m + jnp.log(jnp.maximum(s, 1e-30))


@functools.partial(jax.jit,
                   static_argnames=("tm", "tn", "interpret"))
def row_logsumexp_pallas(a2, iva, ivmuA, muB, tm: int = 128, tn: int = 512,
                         interpret: bool = False):
    """Row-logsumexp of logW = -0.5(a2 + iva·muB²ᵀ − 2(iva⊙muA)·muBᵀ)."""
    na = a2.shape[0]
    nb = muB.shape[0]
    pad_a = (-na) % tm
    if pad_a:
        a2 = jnp.pad(a2, (0, pad_a))
        iva = jnp.pad(iva, ((0, pad_a), (0, 0)))
        ivmuA = jnp.pad(ivmuA, ((0, pad_a), (0, 0)))
    pad_b = (-nb) % tn
    muBp = jnp.pad(muB, ((0, pad_b), (0, 0)))
    # pad the feature (lane) dimension to the TPU lane width: sub-128 last
    # dims mis-tile in compiled mode (zeros don't change the products)
    pad_d = (-iva.shape[1]) % 128
    if pad_d:
        iva = jnp.pad(iva, ((0, 0), (0, pad_d)))
        ivmuA = jnp.pad(ivmuA, ((0, 0), (0, pad_d)))
        muBp = jnp.pad(muBp, ((0, 0), (0, pad_d)))
    muB2 = muBp * muBp

    grid = (a2.shape[0] // tm,)
    out = pl.pallas_call(
        functools.partial(_row_lse_kernel, tn=tn, nb=nb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, iva.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, iva.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),     # muB resident
            pl.BlockSpec(memory_space=pltpu.VMEM),     # muB² resident
        ],
        out_specs=pl.BlockSpec((tm, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a2.shape[0], 1), jnp.float32),
        interpret=interpret,
    )(a2[:, None], iva, ivmuA, muBp, muB2)
    return out[:na, 0]


def pair_row_logsumexp(muA, precA, muB, precB, interpret: bool = False):
    """Row log-partitions of the pair-product weights via the Pallas kernel
    (inputs as in ops/product.pair_product_tangent)."""
    pB0 = precB[0]
    both = (precA > 0) & (pB0[None, :] > 0)
    ivar = jnp.where(both, precA * pB0 / jnp.maximum(precA + pB0, 1e-30),
                     0.0)
    a2 = jnp.sum(ivar * muA * muA, axis=-1)
    return row_logsumexp_pallas(a2, ivar, ivar * muA, muB,
                                interpret=interpret)
