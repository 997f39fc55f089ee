"""Multihypothesis / nullhypothesis recipes as per-particle masks.

TPU-native re-expression of the reference's HypoRecipe machinery
(src/services/ExplicitDiscreteMarginalizations.jl, src/entities/HypoRecipe.jl):
instead of materialising index lists (`allelements`) and per-subset lambda
plans (`activehypo`), we draw one hypothesis id per particle and turn the
reference's particle partitions into gathers + masks over a single batched
solve.  Identical statistics, no ragged control flow.

Hypothesis id convention per particle (int32):
  0          -> null hypothesis (factor inactive; entropy only)
  j >= 1     -> 1-based index into the factor's variable list of the selected
                *uncertain* variable (for plain factors every particle that is
                active gets the id of the solve-target variable slot).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["parse_multihypo", "draw_hypotheses", "HypoMasks", "build_masks"]


def parse_multihypo(multihypo: Optional[Tuple[float, ...]]):
    """Split a user multihypo weight vector into certain/uncertain indices
    (reference parseusermultihypo + getHypothesesVectors,
    src/services/FactorGraph.jl:634-654, ExplicitDiscreteMarginalizations.jl:17-24).

    Weights of 1.0 mark certain variables; fractional weights define the
    categorical over the uncertain alternatives (must sum to ~1).
    """
    if multihypo is None:
        return None
    mh = tuple(float(w) for w in multihypo)
    certain = tuple(i for i, w in enumerate(mh) if w >= 1.0 - 1e-9)
    uncertain = tuple(i for i, w in enumerate(mh) if w < 1.0 - 1e-9)
    if not uncertain:
        return None
    wsum = sum(mh[i] for i in uncertain)
    if abs(wsum - 1.0) > 1e-6:
        raise ValueError(f"multihypo fractional weights must sum to 1, got {wsum}")
    weights = tuple(mh[i] for i in uncertain)
    return certain, uncertain, weights


def draw_hypotheses(key, n: int, nvars: int,
                    multihypo: Optional[Tuple[float, ...]],
                    nullhypo: float) -> jnp.ndarray:
    """Per-particle hypothesis ids (reference mhidx,
    ExplicitDiscreteMarginalizations.jl:28-120)."""
    parsed = parse_multihypo(multihypo)
    if parsed is None:
        # no multihypo: active particles carry a sentinel "all certain" id
        probs = jnp.asarray([nullhypo, 1.0 - nullhypo])
        draw = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)),
                                      shape=(n,))
        return draw.astype(jnp.int32)        # 0=null, 1=active
    certain, uncertain, weights = parsed
    probs = [nullhypo] + [0.0] * nvars
    for i, w in zip(uncertain, weights):
        probs[i + 1] = w * (1.0 - nullhypo)
    probs = jnp.asarray(probs)
    draw = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-30)),
                                  shape=(n,))
    return draw.astype(jnp.int32)


class HypoMasks:
    """Masks + gather plan for one convolution solve-for."""

    def __init__(self, solve_mask, null_mask, snap_mask, uncertain_slot,
                 gather_idx, mech_vars):
        # (n,) bool: particles solved through the factor residual
        self.solve_mask = solve_mask
        # (n,) bool: null-hypothesis particles (entropy only, kappa=spreadNH)
        self.null_mask = null_mask
        # (n,) bool: "snap-together" particles — other hypothesis selected
        # while solving an uncertain var (treated as nullhypo,
        # EvalFactor.jl:208-227)
        self.snap_mask = snap_mask
        # mechanics slot (index into mech_vars) occupied by the selected
        # uncertain variable, or None if no multihypo
        self.uncertain_slot = uncertain_slot
        # (n,) int32 index into the factor's variable list giving, per
        # particle, which variable fills the uncertain slot
        self.gather_idx = gather_idx
        # ordered factor-variable indices feeding the mechanics residual
        self.mech_vars = mech_vars


def build_masks(mhidx: jnp.ndarray, sfidx: int, nvars: int,
                multihypo: Optional[Tuple[float, ...]]) -> HypoMasks:
    """Turn per-particle hypothesis ids into solve/null masks and the
    uncertain-variable gather plan (the mask-world equivalent of
    computeAcrossHypothesis!'s allelements/activehypo dispatch,
    src/services/EvalFactor.jl:145-237)."""
    parsed = parse_multihypo(multihypo)
    null_mask = mhidx == 0
    if parsed is None:
        solve_mask = ~null_mask
        return HypoMasks(solve_mask, null_mask, jnp.zeros_like(null_mask),
                         None, None, tuple(range(nvars)))
    certain, uncertain, _ = parsed
    if sfidx in certain:
        # every active particle solves through its selected hypothesis var
        solve_mask = ~null_mask
        snap_mask = jnp.zeros_like(null_mask)
        gather_idx = jnp.maximum(mhidx - 1, 0)       # factor-var index
        uncertain_rep = min(uncertain)               # per-particle gathered
    else:
        # solving an uncertain var: only particles that selected it solve;
        # other-hypothesis particles snap/spread as nullhypo
        selected = mhidx == (sfidx + 1)
        solve_mask = selected
        snap_mask = (~null_mask) & (~selected)
        gather_idx = jnp.full_like(mhidx, sfidx)
        uncertain_rep = sfidx                        # the target itself
    # mechanics variable order: certain vars + one uncertain slot, in factor
    # slot order (reference activehypo `sort(union(certainidx, h))`)
    mech_vars = tuple(sorted(certain + (uncertain_rep,)))
    uncertain_slot = mech_vars.index(uncertain_rep)
    return HypoMasks(solve_mask, null_mask, snap_mask, uncertain_slot,
                     gather_idx, mech_vars)
