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

    The whole update (all convolutions + bandwidths + product) runs as one
    fused jitted kernel (ops/fused.py) — one device dispatch per update.
    Returns (belief, infoPerCoord).
    """
    from ..beliefs import Belief as _B
    from .convolve import _tile_to, make_conv_spec, static_dim_mask
    from .fused import fused_variable_update

    v = fg.var(target)
    manifold = v.manifold
    n_out = n or v.N
    key = key if key is not None else fg.next_key()

    factors = _solvable_factors(fg, factor_labels)
    old_points = _tile_to(fg.points(target, solve_key), n_out)

    if not factors:
        ipc = jnp.zeros((manifold.dof,), jnp.float32)
        return make_belief(manifold, old_points, ipc=ipc), ipc

    specs, masks, models, nested = [], [], [], []
    for f in factors:
        spec = make_conv_spec(fg, f, target)
        specs.append(spec)
        masks.append(static_dim_mask(manifold, spec.partial_dims))
        models.append(f.model)
        var_points = [fg.points(lbl, solve_key) for lbl in f.variables]
        maxlen = max([n_out] + [p.shape[0] for p in var_points])
        nested.append(tuple(_tile_to(p, maxlen) for p in var_points))

    pts, bw = fused_variable_update(manifold, models, nested, old_points,
                                    specs, masks, key, n_out)
    ipc = jnp.sum(jnp.stack([jnp.asarray(m, jnp.float32) for m in masks]),
                  axis=0)
    return _B(points=pts, bw=bw, ipc=ipc), ipc


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
