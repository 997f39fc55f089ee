"""Belief products at variables — propagate/local product.

Reference: src/services/GraphProductOperations.jl (propagateBelief,
localProduct, localProductAndUpdate!) and the proposal assembly of
src/services/ApproxConv.jl:238-304 (proposalbeliefs!).
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..beliefs import Belief, make_belief
from ..models.factors import MetaPrior, GenericMarginal

__all__ = ["propagate_belief", "local_product", "local_product_and_update",
           "approx_conv_path", "eval_factor_temporary", "prepare_update",
           "UpdatePlan"]


import functools as _functools
import numpy as _np


#: content-keyed device copies of SMALL factor models: regenerated graphs
#: (fresh canonical fixtures, incremental rebuilds) carry value-identical
#: models in brand-new objects, so the per-factor cache misses and the
#:  leaf conversions were the top warm-sweep host bucket
#: (benchmarks/cliq_breakdown.py: 223 us/clique).  Keyed on
#: (treedef, leaf bytes) — exact content match only.
_MODEL_CONTENT_CACHE: dict = {}
_MODEL_CONTENT_CACHE_MAX = 8192


def device_model(f):
    """The factor's model with every pytree leaf as a committed device
    array, cached on the factor (and content-cached globally for small
    models).  Passing raw python/numpy leaves into the jitted updates
    costs a per-leaf canonicalization + device_put on EVERY dispatch
    (profiled: ~188 conversions = ~30 % of a warm LineStep(20) solve
    through the TPU tunnel).  Same immutability contract as the
    parametric group cache (parametric/solver.py): replace models, don't
    mutate them."""
    dm = getattr(f, "_device_model", None)
    if dm is None:
        import jax

        leaves, treedef = jax.tree.flatten(f.model)
        small = all(
            not isinstance(l, jax.Array)
            and isinstance(l, (int, float, _np.generic, _np.ndarray))
            and _np.asarray(l).size <= 64
            for l in leaves)
        if small and leaves:
            try:
                arrs = [_np.asarray(l) for l in leaves]
                key = (treedef, tuple((a.dtype.str, a.shape, a.tobytes())
                                      for a in arrs))
            except Exception:                 # noqa: BLE001
                key = None
            if key is not None:
                dm = _MODEL_CONTENT_CACHE.get(key)
                if dm is None:
                    if len(_MODEL_CONTENT_CACHE) >= _MODEL_CONTENT_CACHE_MAX:
                        _MODEL_CONTENT_CACHE.clear()
                    dm = treedef.unflatten(
                        [jnp.asarray(l) for l in leaves])
                    _MODEL_CONTENT_CACHE[key] = dm
        if dm is None:
            dm = jax.tree.map(jnp.asarray, f.model)
        f._device_model = dm
    return dm


@_functools.lru_cache(maxsize=4096)
def _ipc_of(masks):
    """infoPerCoord from static masks — computed on host, returned as a
    CACHED device array: every belief writeback passes ipc into
    make_belief, whose jnp.asarray on fresh numpy cost one device_put
    dispatch per clique writeback (profiled at ~1/3 of a warm
    LineStep(20) solve through the TPU tunnel)."""
    import jax.numpy as _jnp
    return _jnp.asarray(_np.sum(_np.asarray(masks, _np.float32), axis=0))


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


class UpdatePlan:
    """A prepared variable update: the static structure key + array inputs
    for one fused kernel call.  Same-``structure_key`` plans can execute
    batched (vmapped across the instance axis) — the level-synchronous
    scheduler exploits this across same-level cliques."""

    def __init__(self, fg, target, manifold, models, nested, old_points,
                 specs, masks, n_out, solve_key):
        self.fg = fg
        self.target = target
        self.manifold = manifold
        self.models = tuple(models)
        self.nested = tuple(tuple(v) for v in nested)
        self.old_points = old_points
        self.specs = tuple(specs)
        self.masks = tuple(masks)
        self.n_out = n_out
        self.solve_key = solve_key

    @property
    def structure_key(self):
        from jax import tree_util
        return (self.manifold, self.specs, self.masks, self.n_out,
                tree_util.tree_structure(self.models),
                tuple(tuple(p.shape for p in v) for v in self.nested))

    def ipc(self):
        return _ipc_of(self.masks)


def prepare_update(fg, target: str, factor_labels: Sequence[str],
                   solve_key: str = "default",
                   n: int | None = None):
    """Host-side prep for one variable update; returns an UpdatePlan, or a
    (belief, ipc) passthrough when no solvable factors touch the target."""
    from .convolve import (_tile_to, make_conv_spec, null_surplus_map,
                           static_dim_mask)

    v = fg.var(target)
    manifold = v.manifold
    n_out = n or v.N

    factors = _solvable_factors(fg, factor_labels)
    # canonical factor order: permutations of the same factor set share one
    # fused-kernel compilation (cascade order is statistically neutral)
    factors.sort(key=lambda f: (type(f.model).__name__, len(f.variables),
                                f.variables.index(target)
                                if target in f.variables else -1,
                                f.multihypo or (), f.nullhypo))
    old_points = _tile_to(fg.points(target, solve_key), n_out)

    if not factors:
        ipc = jnp.zeros((manifold.dof,), jnp.float32)
        return make_belief(manifold, old_points, ipc=ipc), ipc

    nsrp = null_surplus_map(fg.params, factors)
    specs, masks, models, nested = [], [], [], []
    for f in factors:
        # per-(factor, target, solver-knobs) plan cache — specs/masks are
        # pure functions of these
        cache = getattr(f, "_conv_cache", None)
        if cache is None:
            cache = f._conv_cache = {}
        pkey = (target, fg.params.inflate_cycles, fg.params.inflation,
                fg.params.spread_nh, fg.params.conv_iters,
                fg.params.conv_damping, nsrp[f.label])
        entry = cache.get(pkey)
        if entry is None:
            spec = make_conv_spec(fg, f, target, null_surplus=nsrp[f.label])
            entry = cache[pkey] = (
                spec, static_dim_mask(manifold, spec.partial_dims))
        spec, mask = entry
        specs.append(spec)
        masks.append(mask)
        models.append(device_model(f))
        var_points = [fg.points(lbl, solve_key) for lbl in f.variables]
        maxlen = max([n_out] + [p.shape[0] for p in var_points])
        nested.append(tuple(_tile_to(p, maxlen) for p in var_points))

    return UpdatePlan(fg, target, manifold, models, nested, old_points,
                      specs, masks, n_out, solve_key)


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
    from .fused import fused_variable_update

    key = key if key is not None else fg.next_key()
    plan = prepare_update(fg, target, factor_labels, solve_key=solve_key,
                          n=n)
    if not isinstance(plan, UpdatePlan):
        return plan                                  # passthrough

    pts, bw = fused_variable_update(plan.manifold, plan.models, plan.nested,
                                    plan.old_points, plan.specs, plan.masks,
                                    key, plan.n_out)
    ipc = plan.ipc()
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


def find_shortest_path_dijkstra(fg, frm: str, to: str, type_factors=(),
                                initialized: bool = False,
                                solve_key: str = "default") -> list:
    """Shortest variable–factor–variable path between two variables,
    optionally restricted to factors of given model classes and/or to
    initialized variables (reference findShortestPathDijkstra via DFG;
    used by the joint-message machinery, TreeMessageUtils.jl:126-205).

    Returns the alternating ``[var, factor, var, …]`` label list, or ``[]``
    when no path exists under the restriction.
    """
    import networkx as nx

    type_factors = tuple(type_factors)
    g = nx.Graph()
    for vl in fg.ls():
        if initialized and not fg.var(vl).is_initialized(solve_key):
            continue
        g.add_node(vl)
    for fl in fg.lsf():
        f = fg.factor(fl)
        if type_factors and not isinstance(f.model, type_factors):
            continue
        if any(v not in g for v in f.variables):
            continue
        for v in f.variables:
            g.add_edge(fl, v)
    try:
        return list(nx.shortest_path(g, frm, to))
    except (nx.NetworkXNoPath, nx.NodeNotFound):
        return []


def is_path_factors_homogeneous(fg, frm: str, to: str):
    """Whether every factor on the shortest ``frm``→``to`` path shares one
    model type; returns ``(is_homogeneous, [type_names])`` (reference
    isPathFactorsHomogeneous, used by addLikelihoodsDifferentialCHILD!,
    TreeMessageUtils.jl:279-335)."""
    path = find_shortest_path_dijkstra(fg, frm, to)
    ftypes = [type(fg.factor(lbl).model).__name__
              for lbl in path[1::2]]
    uniq = sorted(set(ftypes))
    return len(uniq) == 1, uniq


def approx_conv_path(fg, start: str, target: str, key=None,
                     solve_key: str = "default",
                     n: int | None = None):
    """Chained convolution from ``start`` to ``target`` along the shortest
    factor path (reference approxConvBelief(dfg, from, target) with its
    Dijkstra walk through a temporary graph, ApproxConv.jl:75-166)."""
    import networkx as nx

    from .convolve import eval_factor

    g = nx.Graph()
    for fl in fg.lsf():
        for v in fg.factor(fl).variables:
            g.add_edge(fl, v)
    try:
        path = nx.shortest_path(g, start, target)
    except nx.NetworkXNoPath as e:
        raise ValueError(f"no factor path {start} → {target}") from e

    key = key if key is not None else fg.next_key()
    # walk variable → factor → variable, convolving forward on a scratch
    # copy so the main graph is untouched (reference temp-graph semantics)
    import copy
    scratch = copy.copy(fg)
    scratch.variables = {k: copy.copy(v) for k, v in fg.variables.items()}
    for v in scratch.variables.values():
        v.beliefs = dict(v.beliefs)
    cur = start
    pts = scratch.points(cur, solve_key)
    for i in range(1, len(path) - 1, 2):
        fl, nxt = path[i], path[i + 1]
        import jax
        key, sub = jax.random.split(key)
        pts, _ = eval_factor(scratch, fl, nxt, key=sub, solve_key=solve_key,
                             n=n)
        scratch.set_belief(nxt, pts, solve_key=solve_key)
        cur = nxt
    from ..beliefs import make_belief
    return make_belief(fg.var(target).manifold, pts)


def eval_factor_temporary(factor_model, vartypes, values, key=None,
                          n: int = 100, solvefor: int = -1):
    """Evaluate a factor on a throwaway graph built from types + values
    (reference _evalFactorTemporary! / _buildGraphByFactorAndTypes!,
    EvalFactor.jl:625-666, SolverUtilities.jl:147+)."""
    import jax

    from ..graph import FactorGraph

    fg = FactorGraph()
    labels = []
    for i, (vt, val) in enumerate(zip(vartypes, values)):
        lbl = f"x{i + 1}"
        fg.add_variable(lbl, vt, N=n)
        pts = jnp.broadcast_to(jnp.asarray(val, jnp.float32),
                               (n, vt.manifold.point_dim))
        fg.set_belief(lbl, pts)
        labels.append(lbl)
    f = fg.add_factor(labels, factor_model, graphinit=False)
    target = labels[solvefor]
    from .convolve import eval_factor
    pts, _ = eval_factor(fg, f.label, target, key=key, n=n)
    return pts
