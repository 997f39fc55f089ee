"""Belief products at variables — propagate/local product.

Reference: src/services/GraphProductOperations.jl (propagateBelief,
localProduct, localProductAndUpdate!) and the proposal assembly of
src/services/ApproxConv.jl:238-304 (proposalbeliefs!).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..beliefs import Belief, make_belief
from ..models.factors import MetaPrior, GenericMarginal
from .convolve import proposal_from_factor
from .product import Proposal, manifold_product

__all__ = ["propagate_belief", "local_product", "local_product_and_update"]


def _solvable_factors(fg, labels: Iterable[str]):
    out = []
    for fl in labels:
        f = fg.factor(fl)
        if isinstance(f.model, (MetaPrior, GenericMarginal)):
            continue
        if f.solvable <= 0:
            continue
        out.append(f)
    return out


def propagate_belief(fg, target: str, factor_labels: Sequence[str],
                     key=None, solve_key: str = "default",
                     n: int | None = None) -> Tuple[Belief, jnp.ndarray]:
    """Product of per-factor proposals at ``target``
    (reference propagateBelief, GraphProductOperations.jl:16-78).

    Returns (belief, infoPerCoord).
    """
    params = fg.params
    v = fg.var(target)
    manifold = v.manifold
    n_out = n or v.N
    key = key if key is not None else fg.next_key()

    factors = _solvable_factors(fg, factor_labels)
    proposals: List[Proposal] = []
    keys = jax.random.split(key, len(factors) + 1)
    for f, k in zip(factors, keys[:-1]):
        proposals.append(proposal_from_factor(
            fg, f, target, key=k, solve_key=solve_key, n=n_out))

    old_points = fg.points(target, solve_key)
    pts = manifold_product(manifold, proposals, keys[-1], n_out,
                           old_points=old_points,
                           sweeps=params.product_gibbs_sweeps)
    pts = manifold.project(pts)

    # infoPerCoord: accumulated constraint info per tangent dim
    if proposals:
        ipc = jnp.sum(jnp.stack(
            [p.dim_mask.astype(jnp.float32) for p in proposals]), axis=0)
    else:
        ipc = jnp.zeros((manifold.dof,), jnp.float32)
    return make_belief(manifold, pts, ipc=ipc), ipc


def local_product(fg, target: str, key=None, solve_key: str = "default",
                  n: int | None = None) -> Tuple[Belief, jnp.ndarray]:
    """Product over all connected factors (reference localProduct,
    GraphProductOperations.jl:93-123)."""
    return propagate_belief(fg, target, fg.factors_of(target), key=key,
                            solve_key=solve_key, n=n)


def local_product_and_update(fg, target: str, key=None,
                             solve_key: str = "default") -> Belief:
    """Product + write-back (reference localProductAndUpdate!,
    GraphProductOperations.jl:136-155)."""
    belief, ipc = local_product(fg, target, key=key, solve_key=solve_key)
    fg.set_belief(target, belief.points, solve_key=solve_key,
                  bw=belief.bw, ipc=ipc)
    return belief
