"""Static level-synchronous Bayes-tree scheduler.

TPU-native replacement for the reference's clique state machine + async Task
runtime (src/CliqueStateMachine/services/CliqueStateMachine.jl,
src/services/SolverAPI.jl:14-109 taskSolveTree!): instead of one blocking
Task per clique synchronised by rendezvous channels, the tree is swept
level-by-level — up (leaves → root) then down (root → leaves).  Within a
level every clique solve is independent; each clique's numeric work is
already one batched XLA kernel chain, and same-level cliques can be sharded
across a device mesh (parallel/mesh.py).

The reference's data-dependent init/wait dance (waitForUp/initUp cycles)
becomes a bounded fixed point: each up-solve runs a clique-local init cycle
(reference cycleInitByVarOrder!, SolveTree.jl:263-295); cliques the up pass
could not initialize are down-initialized from their parent's solved
separators (tryDownInit_, CliqueStateMachine.jl:699-858), after which the
up sweep re-runs over those cliques and their ancestors and the down sweep
repeats, until no clique down-initializes — bounded by
``SolverParams.limit_treeinit_iters`` passes (reference stall detection,
CliqueStateMachine.jl:573-585).

Per-clique trace records (the CSM-history equivalent,
src/services/TreeDebugTools.jl) are captured when ``record_cliques`` is on.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..beliefs import ppe as calc_ppe
from ..graph import FactorGraph, Variable
from ..graphinit import doautoinit
from ..ops.graphops import local_product_and_update
from ..tree.bayestree import BayesTree, Clique, CliqStatus
from .messages import (MSG_TAG, LikelihoodMessage, add_msg_factors,
                       delete_msg_factors, prep_msg_down, prep_msg_up)

__all__ = ["build_clique_subgraph", "transfer_update_subgraph",
           "add_down_variable_factors",
           "up_solve_clique", "down_solve_clique", "solve_tree_sweeps",
           "cliq_var_init_order_up", "CliqueTrace"]

logger = logging.getLogger("iitpu.scheduler")


@dataclass
class CliqueTrace:
    """Replayable per-clique trace (CSM-history analogue,
    src/entities/JunctionTreeTypes.jl:60-64)."""

    cid: int
    events: List[Tuple[float, str, str]] = field(default_factory=list)
    # captured inputs for replay (reference repeatCSMStep!)
    child_msgs: Optional[List["LikelihoodMessage"]] = None
    down_msg: Optional["LikelihoodMessage"] = None
    # clique subgraph snapshot (reference getCliqSubgraphFromHistory /
    # getGraphFromHistory; belief arrays are shared, not copied)
    subfg: Optional["FactorGraph"] = None

    def log(self, step: str, detail: str = ""):
        self.events.append((time.time(), step, detail))


def build_clique_subgraph(fg: FactorGraph, clique: Clique,
                          device=None) -> FactorGraph:
    """Copy frontal+separator variables and clique potentials into a local
    subgraph (reference buildCliqSubgraph!, SubGraphFunctions.jl:10-90).
    JAX arrays are immutable so belief data is shared, not copied.

    ``device``: optionally pin the subgraph's belief arrays to one device —
    same-level cliques placed on different devices then solve concurrently
    (async dispatch), the mesh equivalent of the reference's per-clique
    worker processes (SolveTree.jl WORKERPOOL)."""
    sub = FactorGraph(fg.params)
    k = fg.next_key()
    # independent deterministic key stream per subgraph, derived on host
    sub.reseed((int(k[0]) * 0x9E3779B1 + int(k[1])) & 0xFFFFFFFF)
    for vl in clique.all_vars:
        v = fg.var(vl)
        beliefs = dict(v.beliefs)
        if device is not None:
            beliefs = {k: b._replace(points=jax.device_put(b.points, device))
                       for k, b in beliefs.items()}
        nv = Variable(label=v.label, vartype=v.vartype, N=v.N,
                      tags=set(v.tags), solvable=v.solvable,
                      beliefs=beliefs,
                      initialized=dict(v.initialized),
                      ppe=dict(v.ppe),
                      parametric_point=v.parametric_point,
                      parametric_cov=v.parametric_cov,
                      marginalized=v.marginalized)
        sub.variables[vl] = nv
        sub._var_factors[vl] = []
    for fl in clique.potentials:
        f = fg.factor(fl)
        sub.factors[fl] = f
        for vl in f.variables:
            if vl in sub._var_factors:
                sub._var_factors[vl].append(fl)
    return sub


class _DescendantFrontals:
    """set-like view of 'frontals of strict descendants of cid' backed by
    the tree's Euler intervals (O(1) membership, no subtree walk)."""

    __slots__ = ("tree", "cid")

    def __init__(self, tree, cid: int):
        self.tree = tree
        self.cid = cid

    def __contains__(self, var: str) -> bool:
        return self.tree.is_descendant_frontal(var, self.cid)

    def __bool__(self) -> bool:
        return True


def add_down_variable_factors(fg: FactorGraph, sub: FactorGraph,
                              clique, solvable: int = 1,
                              require_initialized: Optional[str] = None,
                              exclude=None):
    """Widen a clique subgraph with the frontal-neighbor variables and the
    factors connecting them, as the reference's down solve does
    (addDownVariableFactors!, TreeMessageUtils.jl:490-520: 'between for up,
    frontal connected for down').  ``require_initialized`` drops widened
    variables with no initialized belief under that solve key (their junk
    points would fabricate information; the reference widens post-upsolve
    where neighbors are always initialized).  Returns
    ``(new_vars, new_factors)``."""
    from ..fgos import find_factors_between_from
    from ..tree.accessors import get_cliq_vars_with_frontal_neighbors

    currsyms = list(sub.variables)
    allclsyms = get_cliq_vars_with_frontal_neighbors(fg, clique,
                                                     solvable=solvable)
    newsyms = [s for s in allclsyms if s not in sub.variables]
    if require_initialized is not None:
        newsyms = [s for s in newsyms
                   if fg.var(s).is_initialized(require_initialized)]
    if exclude:
        newsyms = [s for s in newsyms if s not in exclude]
    scope = set(currsyms) | set(newsyms)
    allnewfcts: List[str] = []
    for frt in clique.frontals:
        for fl in find_factors_between_from(fg, scope, frt):
            if fl not in allnewfcts:
                allnewfcts.append(fl)
    newfcts = [fl for fl in allnewfcts if fl not in sub.factors]
    for vl in newsyms:
        v = fg.var(vl)
        sub.variables[vl] = Variable(
            label=v.label, vartype=v.vartype, N=v.N, tags=set(v.tags),
            solvable=v.solvable, beliefs=dict(v.beliefs),
            initialized=dict(v.initialized), ppe=dict(v.ppe),
            parametric_point=v.parametric_point,
            parametric_cov=v.parametric_cov, marginalized=v.marginalized)
        sub._var_factors[vl] = []
    for fl in newfcts:
        f = fg.factor(fl)
        sub.factors[fl] = f
        for vl in f.variables:
            if vl in sub._var_factors and fl not in sub._var_factors[vl]:
                sub._var_factors[vl].append(fl)
    return newsyms, newfcts


def transfer_update_subgraph(fg: FactorGraph, sub: FactorGraph,
                             labels: List[str],
                             solve_key: str = "default") -> None:
    """Write solved beliefs + PPE back to the main graph (reference
    transferUpdateSubGraph!, SubGraphFunctions.jl:131+).  PPEs are lazy —
    identical values, computed only when read (see beliefs.LazyPPE)."""
    from ..beliefs import LazyPPE

    for vl in labels:
        sv = sub.var(vl)
        if solve_key not in sv.beliefs:
            continue
        b = sv.beliefs[solve_key]
        fg.set_belief(vl, b.points, solve_key=solve_key, bw=b.bw, ipc=b.ipc,
                      initialized=sv.is_initialized(solve_key))
        fg.var(vl).ppe[solve_key] = LazyPPE(sv.manifold, b)


def _msg_summary(msg: LikelihoodMessage) -> dict:
    """Per-variable raw particle references of a down message for the
    wildfire comparison.

    Deliberately does NO math: jax arrays are immutable so keeping the
    reference is free, and any eager per-clique reduction here costs a
    device round-trip per op — on a tunneled TPU that serialized the whole
    down sweep and cost more than the solves the gate skips.  All the math
    runs in ONE jitted call per candidate variable inside
    :func:`_wildfire_unchanged`."""
    return {vlbl: b.points for vlbl, b in msg.beliefs.items()}


@jax.jit
def _wildfire_stat_many(news, olds):
    """Max spread-normalized mean displacement across variable pairs — the
    wildfire gate statistic for a whole clique in ONE fused device call
    (per-variable calls each cost a blocking tunnel round-trip, which made
    the gate slower than the down-solves it skips)."""
    stats = []
    for pts_new, pts_old in zip(news, olds):
        mn = jnp.mean(pts_new, axis=0)
        mo = jnp.mean(pts_old, axis=0)
        sn = jnp.mean(jnp.std(pts_new, axis=0))
        so = jnp.mean(jnp.std(pts_old, axis=0))
        stats.append(jnp.linalg.norm(mn - mo) /
                     jnp.maximum(jnp.maximum(sn, so), 1e-9))
    return jnp.max(jnp.stack(stats))


#: ``wildfire_tol="auto"`` resolution constants, set from the measured
#: crossover (BASELINE "Wildfire gate: measured crossover", TPU v5e):
#: the gate's one statistic sync per step costs ~35-40 ms through the
#: tunnel and pays for itself at ~60-80 skippable recycled cliques; the
#: tolerance is the value every gate bench used.
WILDFIRE_AUTO_MIN_RECYCLED = 64
WILDFIRE_AUTO_TOL = 0.8


def _wildfire_unchanged(new: dict, old: Optional[dict], tol: float) -> bool:
    """True when every separator mean moved < tol spread-normalized units —
    the incremental down message carries no new information worth
    re-solving for (iSAM2 wildfire-threshold analogue)."""
    if old is None or set(new) != set(old):
        return False
    pairs = []
    for vlbl, pn in new.items():
        po = old[vlbl]
        if pn.shape != po.shape:
            return False
        if pn is po:
            continue            # identical array object — trivially unchanged
        pairs.append((pn, po))
    if not pairs:
        return True
    # the only device sync on the gate path: one per clique
    stat = _wildfire_stat_many(tuple(p for p, _ in pairs),
                               tuple(p for _, p in pairs))
    return float(stat) <= tol


def _use_chain(params) -> bool:
    """Resolve the fuse_clique knob: True/False explicit, "auto" enables
    the whole-clique chain on accelerator backends only (SolverParams
    docstring has the rationale)."""
    fc = getattr(params, "fuse_clique", "auto")
    if fc is True or fc is False:
        return fc
    return jax.default_backend() != "cpu"


def cliq_var_init_order_up(sub: FactorGraph,
                           variables: Optional[Sequence[str]] = None
                           ) -> List[str]:
    """Clique up-init variable order (reference getCliqVarInitOrderUp,
    TreeBasedInitialization.jl:19-57): prior-attached variables first, then
    everything else, both by ascending connected-factor count (stable)."""
    labels = list(variables) if variables is not None else sub.ls()
    nf = {v: len(sub.factors_of(v)) for v in labels}
    sortedids = sorted(labels, key=lambda v: nf[v])
    prior_attached = set()
    for fl in sub.lsf():
        f = sub.factor(fl)
        if getattr(f.model, "is_prior", False):
            prior_attached.update(f.variables)
    order = [v for v in sortedids if v in prior_attached]
    order += [v for v in sortedids if v not in prior_attached]
    return order


def _cycle_init_by_var_order(sub: FactorGraph, clique: Clique,
                             solve_key: str = "default",
                             max_cycles: int | None = None) -> bool:
    """Repeat auto-init over the clique's variables until no change
    (reference cycleInitByVarOrder!, SolveTree.jl:263-295; ordering per
    getCliqVarInitOrderUp, TreeBasedInitialization.jl:19-57).  Bounded by
    ``SolverParams.limit_iters`` (reference limititers runaway guard,
    SolverParams.jl:42) — the loop exits as soon as a pass changes
    nothing, so the bound only trips on oscillation."""
    if max_cycles is None:
        max_cycles = max(1, int(getattr(sub.params, "limit_iters", 500)))
    order = cliq_var_init_order_up(sub, clique.all_vars)
    for _ in range(max_cycles):
        changed = False
        for vl in order:
            if not sub.var(vl).is_initialized(solve_key):
                if doautoinit(sub, vl, solve_key=solve_key):
                    changed = True
        if all(sub.var(v).is_initialized(solve_key)
               for v in clique.all_vars):
            return True
        if not changed:
            return False
    return all(sub.var(v).is_initialized(solve_key)
               for v in clique.all_vars)


def _gibbs_solve(sub: FactorGraph, clique: Clique, variables: List[str],
                 iters: int, solve_key: str = "default") -> None:
    """Outer Gibbs over clique variables: per variable, product of all
    connected potentials (reference fmcmc!, SolveTree.jl:89-142)."""
    for sweep in range(iters):
        for vl in variables:
            if sub.var(vl).marginalized:
                continue
            if not sub.factors_of(vl):
                # factor-less (orphaned) variable: nothing to update and it
                # must not be marked initialized by a passthrough write
                continue
            local_product_and_update(sub, vl, solve_key=solve_key)


class _ChainPlan:
    """Whole-clique chain plan + a cached handle to its compiled kernel
    (avoids re-hashing the nested step tuples on every dispatch)."""

    __slots__ = ("direct_steps", "iter_steps", "direct_labels",
                 "iter_labels", "touched", "_fn")

    def __init__(self, direct_steps, iter_steps, direct_labels,
                 iter_labels, touched):
        self.direct_steps = direct_steps
        self.iter_steps = iter_steps
        self.direct_labels = direct_labels
        self.iter_labels = iter_labels
        self.touched = touched
        self._fn = None

    def fn(self, n_rounds: int):
        if self._fn is None:
            from ..ops.fused import _fused_chain_fn
            self._fn = _fused_chain_fn(self.direct_steps, self.iter_steps,
                                       int(n_rounds))
        return self._fn


#: structural plan cache for whole-clique chains: the per-variable step
#: plans (specs/masks/local indices) depend only on the clique's symbolic
#: structure, not on particle data, so re-solves of the same structure
#: (incremental updates, repeated solves, regenerated canonical graphs)
#: skip the ~1 ms/clique Python plan build entirely.
_CHAIN_PLAN_CACHE: Dict[Tuple, Tuple] = {}
_CHAIN_PLAN_CACHE_MAX = 4096
# chain structures whose fused program failed to compile/run (e.g. HBM
# OOM at very large N): skip the chain path for them permanently
_CHAIN_POISONED: set = set()


def _chain_plan_key(sub: FactorGraph, live: List[str], dvs: List[str],
                    ivs: List[str], params, solve_key: str):
    """Cheap structural key for the chain plan: variable layout, each
    factor's symbolic form (model treedef captures component structure),
    and the solver knobs baked into ConvSpecs."""
    try:
        vars_part = tuple((v, sub.var(v).vartype.name, sub.var(v).N)
                          for v in live)
        fact_part = []
        for fl in sub.lsf():
            f = sub.factor(fl)
            fact_part.append((fl, f.variables, f.multihypo, f.nullhypo,
                              f.solvable,
                              jax.tree_util.tree_structure(f.model)))
    except Exception:          # unhashable model structure → no caching
        return None
    return (vars_part, tuple(fact_part), tuple(dvs), tuple(ivs),
            params.inflate_cycles, params.inflation, params.spread_nh,
            params.conv_iters, params.conv_damping, params.gibbs_iters,
            solve_key)


def _build_chain_plan(sub: FactorGraph, clique: Clique,
                      direct: List[str], iter_vars: List[str],
                      solve_key: str = "default"):
    """Assemble (or fetch from the structural cache) the whole-clique chain
    plan against ``sub`` (with message factors already inserted).

    Returns (plan, store, live) where plan is
    (direct_steps, iter_steps, direct_labels, iter_labels, touched),
    or plan=True (nothing to solve) / plan=False (general path needed)."""
    from ..ops.convolve import (make_conv_spec, null_surplus_map,
                                static_dim_mask)

    params = sub.params
    # all subgraph variables (a superset of clique.all_vars when the down
    # solve widened the subgraph with frontal neighbors) so widened factors
    # stay inside the fused chain's local store
    live = list(sub.variables)
    local = {v: i for i, v in enumerate(live)}

    def updatable(vl):
        return not sub.var(vl).marginalized and sub.factors_of(vl)

    dvs = [v for v in direct if updatable(v)]
    ivs = [v for v in iter_vars if updatable(v)]
    if not dvs and not ivs:
        return True, None, live

    store = [sub.points(v, solve_key) for v in live]
    n_set = {p.shape[0] for p in store}
    if len(n_set) != 1:
        return False, None, live

    pkey_struct = _chain_plan_key(sub, live, dvs, ivs, params, solve_key)
    if pkey_struct is not None:
        # belief particle counts are data (may differ from Variable.N)
        pkey_struct = pkey_struct + (tuple(p.shape[0] for p in store),)
    cached = (_CHAIN_PLAN_CACHE.get(pkey_struct)
              if pkey_struct is not None else None)
    if cached is not None:
        if cached is False:
            return False, None, live
        if not cached.direct_steps and not cached.iter_steps:
            return True, None, live
        return cached, store, live
    else:
        def build_step(var):
            """One static update plan, or None (no factors) / False (needs
            the general path)."""
            v = sub.var(var)
            factors = _canonical_factors(sub, var)
            if not factors:
                return None
            nsrp = null_surplus_map(params, factors)
            specs, masks, models, fvidx, labels = [], [], [], [], []
            for f in factors:
                if any(lbl not in local for lbl in f.variables):
                    return False
                cache = getattr(f, "_conv_cache", None)
                if cache is None:
                    cache = f._conv_cache = {}
                pkey = (var, params.inflate_cycles, params.inflation,
                        params.spread_nh, params.conv_iters,
                        params.conv_damping, nsrp[f.label])
                entry = cache.get(pkey)
                if entry is None:
                    spec = make_conv_spec(sub, f, var,
                                          null_surplus=nsrp[f.label])
                    entry = cache[pkey] = (
                        spec, static_dim_mask(v.manifold, spec.partial_dims))
                spec, mask = entry
                specs.append(spec)
                masks.append(mask)
                models.append(f.model)
                labels.append(f.label)
                fvidx.append(tuple(local[lbl] for lbl in f.variables))
            if v.N != store[local[var]].shape[0]:
                return False
            step = (local[var], v.manifold, tuple(specs), tuple(masks),
                    v.N, tuple(fvidx))
            return step, tuple(models), tuple(masks), tuple(labels)

        direct_steps, direct_labels = [], []
        iter_steps, iter_labels = [], []
        touched = {}
        for var in dvs + ivs:
            built = build_step(var)
            if built is None:
                continue
            if built is False:
                if pkey_struct is not None:
                    _CHAIN_PLAN_CACHE[pkey_struct] = False
                return False, None, live
            step, models, masks, labels = built
            if var in dvs:
                direct_steps.append(step)
                direct_labels.append(labels)
            else:
                iter_steps.append(step)
                iter_labels.append(labels)
            touched[step[0]] = masks
        plan = _ChainPlan(tuple(direct_steps), tuple(iter_steps),
                          tuple(direct_labels), tuple(iter_labels),
                          dict(touched))
        if pkey_struct is not None:
            if len(_CHAIN_PLAN_CACHE) >= _CHAIN_PLAN_CACHE_MAX:
                _CHAIN_PLAN_CACHE.clear()
            _CHAIN_PLAN_CACHE[pkey_struct] = plan
        if not direct_steps and not iter_steps:
            return True, None, live
        return plan, store, live


def _gibbs_solve_chain(sub: FactorGraph, clique: Clique,
                       direct: List[str], iter_vars: List[str],
                       solve_key: str = "default", mesh=None) -> bool:
    """Whole-clique Gibbs schedule as ONE jitted dispatch
    (ops/fused.py:_fused_chain_fn).  The sequential path costs one device
    dispatch per variable update (~dozens per clique); here the full
    schedule — direct vars once, iter vars × gibbs_iters — is a single
    XLA program cached per clique-structure signature.  Returns False when
    the clique's structure needs the general path (mixed particle counts,
    factors reaching outside the clique store).

    ``mesh``: shard the PARTICLE axis of the clique store across the
    device mesh (GSPMD partitions the chain program; the N² belief-product
    weight matrices row-shard, elementwise/vmapped work splits evenly).
    This is the narrow-level multi-device axis — one clique, many chips —
    complementing the wide-level clique-batch axis (VERDICT r4 item #3)."""
    from ..ops.graphops import _ipc_of

    params = sub.params
    plan, store, live = _build_chain_plan(sub, clique, direct, iter_vars,
                                          solve_key)
    if plan is True:
        return True
    if plan is False:
        return False
    from ..ops.graphops import device_model
    models_direct = tuple(tuple(device_model(sub.factor(fl)) for fl in fls)
                          for fls in plan.direct_labels)
    models_iter = tuple(tuple(device_model(sub.factor(fl)) for fl in fls)
                        for fls in plan.iter_labels)

    if mesh is not None:
        ndev = int(mesh.devices.size)
        if all(p.shape[0] % ndev == 0 for p in store):
            from jax.sharding import NamedSharding, PartitionSpec
            sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            store = [jax.device_put(p, sh) for p in store]
        # non-divisible N: run unsharded (the program is identical either
        # way; sharding is a pure placement hint)

    # a fused whole-clique program can exceed HBM at very large N (the
    # schedule's live buffers all coexist in one program; observed OOM at
    # N=50k) — fall back to the per-variable path, and poison the
    # signature so the failing compile is not re-attempted every solve
    sig = (plan.direct_steps, plan.iter_steps,
           tuple(p.shape for p in store))
    if sig in _CHAIN_POISONED:
        return False
    try:
        new_store, dbws, ibws = plan.fn(params.gibbs_iters)(
            models_direct, models_iter, tuple(store), sub.next_key())
    except Exception as e:                            # noqa: BLE001
        logger.warning("fused clique chain failed (%s); using the "
                       "per-variable path for this structure",
                       str(e)[:200])
        _CHAIN_POISONED.add(sig)
        return False
    bw_of = {step[0]: bw for step, bw in zip(plan.direct_steps, dbws)}
    bw_of.update({step[0]: bw for step, bw in zip(plan.iter_steps, ibws)})
    touched = plan.touched
    for li, masks in touched.items():
        sub.set_belief(live[li], new_store[li], solve_key=solve_key,
                       bw=bw_of[li], ipc=_ipc_of(masks))
    return True


def _particle_mesh(params, mesh):
    """Resolve the width-aware distribution policy for a clique that is
    NOT in a batched level: particle-shard it across ``mesh`` unless
    ``SolverParams.shard_particles`` disables the axis (VERDICT r4 item
    #3 — narrow levels previously got nothing from a device mesh)."""
    if mesh is None:
        return None
    sp = getattr(params, "shard_particles", "auto")
    return mesh if sp in (True, "auto") else None


def _use_sweep(params) -> bool:
    fs = getattr(params, "fuse_sweep", "auto")
    if fs is True or fs is False:
        return fs
    # "auto" currently resolves to OFF: the merged segment program both
    # compiles and runs slower than the per-clique fused chains on TPU
    # (see SolverParams.fuse_sweep)
    return False


def _segment_eligible(fg, cl: Clique, solve_key: str) -> bool:
    """A clique can join a fused chain segment when its up-solve needs no
    host-side control flow: fully initialized, not recycled/marginalized,
    and every variable updatable through the chain plan."""
    if cl.is_marginalized or (cl.is_recycled
                              and cl.status == CliqStatus.UPRECYCLED):
        return False
    for v in cl.all_vars:
        if not fg.var(v).is_initialized(solve_key):
            return False
    return True


def _find_up_segments(fg, tree: BayesTree, skip_set, delay_cliques,
                      dev_of, solve_key: str,
                      excluded: Optional[set] = None
                      ) -> Dict[int, List[Clique]]:
    """Maximal chains of single-child cliques eligible for one-dispatch
    up sweeps, keyed by the BOTTOM clique's id."""
    if fg.params.use_msg_likelihoods:
        return {}
    excluded = excluded or set()
    in_chain: Dict[int, int] = {}   # cid -> segment bottom
    segments: Dict[int, List[Clique]] = {}

    def blocked(cid):
        return (cid in skip_set or cid in delay_cliques or cid in dev_of
                or cid in excluded)

    # visit deepest-first so chains start at their true bottoms
    order = [cid for level in reversed(tree.levels()) for cid in level]
    for cid0 in order:
        cl = tree.clique(cid0)
        if cl.cid in in_chain or blocked(cl.cid) or \
                not _segment_eligible(fg, cl, solve_key):
            continue
        # only start at a chain bottom: a clique whose children are all
        # OUTSIDE any chain (their messages arrive as concrete factors)
        chain = [cl]
        cur = cl
        while cur.parent is not None:
            par = tree.clique(cur.parent)
            if par.children != [cur.cid]:
                break
            if blocked(par.cid) or par.cid in in_chain or \
                    not _segment_eligible(fg, par, solve_key):
                break
            chain.append(par)
            cur = par
        if len(chain) >= 2:
            for c in chain:
                in_chain[c.cid] = chain[0].cid
            segments[chain[0].cid] = chain
    # drop overlapping starts: a clique mid-chain could also have started
    # its own chain; in_chain bookkeeping above already prevents that.
    return segments


def up_solve_segment(fg: FactorGraph, tree: BayesTree,
                     chain: List[Clique],
                     bottom_msgs: List[LikelihoodMessage],
                     solve_key: str,
                     trace_for) -> Optional[Dict[int, LikelihoodMessage]]:
    """Solve a chain of cliques bottom-up in ONE device dispatch
    (ops/fused.py:fused_up_segment); the inter-clique messages are
    substituted in-trace.  Returns per-clique up messages (the down sweep
    still consumes them), or None when any member needs the general path
    (caller falls back to per-clique solves)."""
    from ..ops.fused import fused_up_segment
    from ..ops.graphops import _ipc_of

    params = fg.params
    seg_static, models_d_all, models_i_all = [], [], []
    stores, keys, metas = [], [], []
    prev_live: Optional[List[str]] = None
    prev_cl: Optional[Clique] = None

    for idx, cl in enumerate(chain):
        sub = build_clique_subgraph(fg, cl)
        msg_label_to_var: Dict[str, str] = {}
        if idx == 0:
            for m in bottom_msgs:
                if m.status == CliqStatus.ERROR_STATUS:
                    return None
                add_msg_factors(sub, m)
        else:
            # placeholder internal message: same structure as the runtime
            # message, beliefs substituted in-trace from the child output
            pm = LikelihoodMessage(sender=prev_cl.cid,
                                   status=CliqStatus.UPSOLVED,
                                   direction="up")
            for vlbl in prev_cl.separator:
                if vlbl in fg.variables and \
                        solve_key in fg.var(vlbl).beliefs:
                    pm.beliefs[vlbl] = fg.get_belief(vlbl, solve_key)
            added = add_msg_factors(sub, pm)
            for fl in added:
                vl = fl.split(f"_{MSG_TAG}_")[0]
                msg_label_to_var[fl] = vl
            if set(msg_label_to_var.values()) != set(prev_cl.separator):
                return None          # unexpected message shape → fallback

        plan, store, live = _build_chain_plan(
            sub, cl, cl.direct_vars, cl.iter_vars, solve_key)
        if plan is True or plan is False:
            return None
        dsteps, isteps = plan.direct_steps, plan.iter_steps
        dlabels, ilabels = plan.direct_labels, plan.iter_labels
        touched = plan.touched

        msg_subs = []
        if idx > 0:
            child_local = {v: i for i, v in enumerate(prev_live)}
            for which, labels_group in ((0, dlabels), (1, ilabels)):
                for si, fls in enumerate(labels_group):
                    for fi, fl in enumerate(fls):
                        vl = msg_label_to_var.get(fl)
                        if vl is not None:
                            msg_subs.append(
                                (which, si, fi, child_local[vl],
                                 sub.var(vl).manifold))
        from ..ops.graphops import device_model
        seg_static.append((dsteps, isteps, tuple(msg_subs)))
        models_d_all.append(tuple(tuple(device_model(sub.factor(fl))
                                        for fl in fls) for fls in dlabels))
        models_i_all.append(tuple(tuple(device_model(sub.factor(fl))
                                        for fl in fls) for fls in ilabels))
        stores.append(tuple(store))
        keys.append(fg.next_key())
        metas.append((cl, sub, live, touched, dsteps, isteps))
        prev_live, prev_cl = live, cl

    outs = fused_up_segment(seg_static, params.gibbs_iters,
                            models_d_all, models_i_all, stores, keys)

    up_out: Dict[int, LikelihoodMessage] = {}
    for (cl, sub, live, touched, dsteps, isteps), (store, dbws, ibws) in \
            zip(metas, outs):
        bw_of = {s[0]: bw for s, bw in zip(dsteps, dbws)}
        bw_of.update({s[0]: bw for s, bw in zip(isteps, ibws)})
        for li, masks in touched.items():
            sub.set_belief(live[li], store[li], solve_key=solve_key,
                           bw=bw_of[li], ipc=_ipc_of(masks))
        cl.status = CliqStatus.UPSOLVED
        msg = prep_msg_up(sub, cl, CliqStatus.UPSOLVED, solve_key)
        transfer_update_subgraph(fg, sub, cl.frontals, solve_key)
        tr = trace_for(cl.cid)
        tr.log("up_gibbs", "fused-segment")
        tr.log("up_done")
        up_out[cl.cid] = msg
    return up_out


def up_solve_clique(fg: FactorGraph, tree: BayesTree, clique: Clique,
                    child_msgs: List[LikelihoodMessage],
                    solve_key: str = "default",
                    trace: Optional[CliqueTrace] = None,
                    device=None, mesh=None) -> LikelihoodMessage:
    """One clique up-solve (reference CSM states 2a-2e: preUpSolve_ →
    solveUp_ → postUpSolve_, CliqueStateMachine.jl:275-600, with the Gibbs
    body of upGibbsCliqueDensity, SolveTree.jl:164-239).

    ``mesh``: particle-shard this clique's fused chain across the device
    mesh (the narrow-level multi-device axis; see _gibbs_solve_chain)."""
    params = fg.params
    t = trace or CliqueTrace(clique.cid)

    if clique.is_marginalized or (clique.is_recycled and
                                  clique.status == CliqStatus.UPRECYCLED):
        # recycled/marginalized: re-emit message from existing beliefs
        t.log("recycle", "skip up-solve")
        msg = LikelihoodMessage(sender=clique.cid, status=clique.status,
                                direction="up")
        for vlbl in clique.separator:
            msg.beliefs[vlbl] = fg.get_belief(vlbl, solve_key)
        return msg

    sub = build_clique_subgraph(fg, clique, device=device)
    if params.record_cliques:
        t.subfg = sub
    t.log("build_subgraph", f"{len(sub.variables)} vars, "
                            f"{len(sub.factors)} factors")

    for msg in child_msgs:
        if msg.status == CliqStatus.ERROR_STATUS:
            # propagate upward without solving (reference waitForUp_ ERROR
            # branch, CliqueStateMachine.jl:242-251)
            clique.status = CliqStatus.ERROR_STATUS
            raise RuntimeError(
                f"clique {clique.cid}: child {msg.sender} errored")
        add_msg_factors(sub, msg)
    t.log("add_msg_factors", f"{len(child_msgs)} child messages")

    ok = _cycle_init_by_var_order(sub, clique, solve_key)
    if not ok:
        # up-solve of an uninitializable clique: emit NO_INIT (parents may
        # still init it downward — reference tryDownInit path)
        t.log("no_init")
        clique.status = CliqStatus.NO_INIT
        msg = prep_msg_up(sub, clique, CliqStatus.NO_INIT, solve_key)
        transfer_update_subgraph(fg, sub, clique.frontals, solve_key)
        return msg

    # Gibbs partitions (reference upGibbsCliqueDensity order:
    # direct-frontal-msg → msgskip → itervars ×gibbsIters → direct priors)
    solvable = [v for v in clique.direct_vars]
    fused = _use_chain(params) and _gibbs_solve_chain(
        sub, clique, solvable, clique.iter_vars, solve_key, mesh=mesh)
    if not fused:
        _gibbs_solve(sub, clique, solvable, 1, solve_key)
        if clique.iter_vars:
            _gibbs_solve(sub, clique, clique.iter_vars, params.gibbs_iters,
                         solve_key)
    t.log("up_gibbs", f"direct={len(solvable)} iter={len(clique.iter_vars)}"
                      f"{' fused-chain' if fused else ''}")

    clique.status = CliqStatus.UPSOLVED
    msg = prep_msg_up(sub, clique, CliqStatus.UPSOLVED, solve_key)
    transfer_update_subgraph(fg, sub, clique.frontals, solve_key)
    t.log("up_done")
    return msg


def down_solve_clique(fg: FactorGraph, tree: BayesTree, clique: Clique,
                      down_msg: Optional[LikelihoodMessage],
                      solve_key: str = "default",
                      child_msgs: Optional[List[LikelihoodMessage]] = None,
                      trace: Optional[CliqueTrace] = None, mesh=None
                      ) -> Dict[int, LikelihoodMessage]:
    """One clique down-solve (reference CSM states 4a-4d; frontal products
    of solveCliqDownFrontalProducts!, CliqStateMachineUtils.jl:479-571).

    ``child_msgs`` re-attach the children's up-messages: the reference's
    cliqSubFg still holds those message factors during the down phase
    (deleteMsgFactors! only runs at updateFromSubgraph), so frontal products
    see the full subtree information — without them a root would re-solve
    its frontals from its own potentials alone and lose child constraints.
    Returns down messages for each child."""
    params = fg.params
    t = trace or CliqueTrace(clique.cid)

    if clique.is_marginalized:
        t.log("marginalized", "skip down-solve")
        sub = build_clique_subgraph(fg, clique)
        return {ch.cid: prep_msg_down(sub, clique, ch, clique.status,
                                      solve_key)
                for ch in tree.children(clique.cid)}

    sub = build_clique_subgraph(fg, clique)
    # widen with frontal-neighbor variables + connecting factors so the
    # frontal products see cross-clique constraints (reference
    # addDownVariableFactors! call in the down solve,
    # CliqueStateMachine.jl:824); transfer scope stays frontals-only.
    # Variables living in DESCENDANT cliques are excluded: their subtree
    # information already arrived through the child up-messages that stay
    # attached during the down phase, so pulling their (stale, pre-down)
    # beliefs in as factor anchors would double-count — the "disparity on
    # whether up and down solves should use exactly the same subgraph" the
    # reference itself flags (TreeMessageUtils.jl:488) and measurably
    # drags chain down-corrections here.  Membership rides the tree's
    # Euler intervals (a per-clique subtree WALK here was O(depth²) per
    # down sweep on chain graphs).
    add_down_variable_factors(fg, sub, clique,
                              require_initialized=solve_key,
                              exclude=_DescendantFrontals(tree, clique.cid))
    for cmsg in (child_msgs or []):
        add_msg_factors(sub, cmsg)
    clique.down_inited = False
    if down_msg is not None and clique.status == CliqStatus.NO_INIT:
        # down-init: the parent's solved separators can initialize cliques
        # the up pass could not (reference tryDownInit_/preDownSolve,
        # CliqueStateMachine.jl:699-858)
        pre_uninit = {v for v in clique.all_vars
                      if not sub.var(v).is_initialized(solve_key)}
        for vlbl, belief in down_msg.beliefs.items():
            if vlbl in sub.variables:
                sub.set_belief(vlbl, belief.points, solve_key=solve_key,
                               bw=belief.bw, ipc=belief.ipc)
        _cycle_init_by_var_order(sub, clique, solve_key)
        newly = {v for v in pre_uninit
                 if sub.var(v).is_initialized(solve_key)}
        clique.down_inited = bool(newly)
        t.log("down_init", f"{len(newly)}/{len(pre_uninit)} vars")
        if not all(sub.var(v).is_initialized(solve_key)
                   for v in clique.all_vars):
            # still uninitializable even with the parent's information:
            # stay NO_INIT, pass the separator info through so deeper
            # cliques can try, and let the sweep fixed point retry next
            # pass (reference stall path, CliqueStateMachine.jl:573-585)
            transfer_update_subgraph(fg, sub, clique.frontals, solve_key)
            t.log("down_no_init")
            return {ch.cid: prep_msg_down(sub, clique, ch,
                                          CliqStatus.NO_INIT, solve_key)
                    for ch in tree.children(clique.cid)}
    if down_msg is not None:
        add_msg_factors(sub, down_msg)
        # pin separator beliefs straight from the parent's solution
        for vlbl, belief in down_msg.beliefs.items():
            if vlbl in sub.variables:
                sub.set_belief(vlbl, belief.points, solve_key=solve_key,
                               bw=belief.bw, ipc=belief.ipc)
                sub.var(vlbl).marginalized = True   # fixed during down-solve
    if not all(sub.var(v).is_initialized(solve_key)
               for v in clique.all_vars):
        # uninitializable clique (e.g. a prior-less root): solving frontal
        # products over identity-junk points would fabricate information —
        # stay NO_INIT and pass through whatever beliefs exist
        clique.status = CliqStatus.NO_INIT
        t.log("down_no_init")
        return {ch.cid: prep_msg_down(sub, clique, ch, CliqStatus.NO_INIT,
                                      solve_key)
                for ch in tree.children(clique.cid)}
    t.log("down_start")

    # solve frontals: iterate those with cross-frontal coupling
    iter_frontals = [v for v in clique.iter_vars if v in clique.frontals]
    direct_frontals = [v for v in clique.frontals if v not in iter_frontals]
    fused = _use_chain(params) and _gibbs_solve_chain(
        sub, clique, direct_frontals, iter_frontals, solve_key, mesh=mesh)
    if not fused:
        _gibbs_solve(sub, clique, direct_frontals, 1, solve_key)
        if iter_frontals:
            _gibbs_solve(sub, clique, iter_frontals, params.gibbs_iters,
                         solve_key)
    t.log("down_gibbs", f"direct={len(direct_frontals)} "
                        f"iter={len(iter_frontals)}"
                        f"{' fused-chain' if fused else ''}")

    clique.status = CliqStatus.DOWNSOLVED
    transfer_update_subgraph(fg, sub, clique.frontals, solve_key)
    out = {ch.cid: prep_msg_down(sub, clique, ch, CliqStatus.DOWNSOLVED,
                                 solve_key)
           for ch in tree.children(clique.cid)}
    t.log("down_done")
    return out


def solve_tree_sweeps(fg: FactorGraph, tree: BayesTree,
                      solve_key: str = "default",
                      up: bool = True, down: bool = True,
                      traces: Optional[Dict[int, CliqueTrace]] = None,
                      skip_cliques: Sequence[int] = (),
                      delay_cliques: Dict[int, float] | None = None,
                      devices: Optional[Sequence] = None,
                      timeout: Optional[float] = None,
                      mesh=None
                      ) -> Dict[int, CliqueTrace]:
    """Full level-synchronous up sweep then down sweep.

    ``mesh``: shard each batched level's stacked clique solves across the
    device mesh (multi-chip clique parallelism; requires batch_cliques).

    Fault-injection hooks mirror the reference's solveTree! kwargs
    (delaycliqs/skipcliqids/injectDelayBefore, SolverAPI.jl:333-337):
    ``skip_cliques`` leave their cliques untouched; ``delay_cliques`` sleep
    before the clique's up-solve.  A clique whose solve raises is marked
    ERROR_STATUS and its error message floods the remaining schedule so
    siblings still complete (the reference's monitorCSMs/
    bruteForcePushErrorCSM semantics, CliqStateMachineUtils.jl:184-246);
    the error re-raises after the sweep finishes.
    """
    traces = traces if traces is not None else {}
    delay_cliques = delay_cliques or {}
    skip_set = set(skip_cliques)
    # soft wall-clock budget (reference solveTree! timeout bounding each
    # CSM, SolverAPI.jl:16 / CliqueStateMachine.jl:86-95): checked between
    # clique solves; an expired budget marks the remaining cliques
    # ERROR_STATUS, same flooding semantics as a failed clique
    deadline = (time.time() + timeout) if timeout else None

    def _timed_out(cl) -> bool:
        if deadline is not None and time.time() > deadline:
            cl.status = CliqStatus.ERROR_STATUS
            errors.append((cl.cid, TimeoutError(
                f"solve timeout ({timeout}s) before clique {cl.cid}")))
            return True
        return False
    dev_of = {}
    if devices:
        # round-robin same-level cliques across devices: async dispatch
        # overlaps their kernel chains (clique-parallel axis)
        for level in tree.levels():
            for i, cid in enumerate(level):
                dev_of[cid] = devices[i % len(devices)]
    errors: List[Tuple[int, Exception]] = []

    def trace_for(cid: int) -> CliqueTrace:
        if fg.params.record_cliques and cid not in traces:
            traces[cid] = CliqueTrace(cid)
        return traces.get(cid) or CliqueTrace(cid)

    levels = tree.levels()
    up_msgs: Dict[int, LikelihoodMessage] = {}

    bc = getattr(fg.params, "batch_cliques", False)
    min_width = getattr(fg.params, "batch_min_width", 8)

    def _batch_level(level):
        if bc is True:
            return True
        if bc == "auto":
            return len(level) >= min_width
        return False

    if up and bc and not skip_set and not delay_cliques and not dev_of:
        # cliques in to-be-batched levels stay out of chain segments
        batched_cids = {cid for level in levels if _batch_level(level)
                        for cid in level}
        segments = (_find_up_segments(fg, tree, skip_set, delay_cliques,
                                      dev_of, solve_key,
                                      excluded=batched_cids)
                    if _use_sweep(fg.params) else {})
        seg_handled: set = set()
        for level in reversed(levels):
            if not _batch_level(level):
                for cid in level:
                    if cid in seg_handled:
                        continue
                    cl = tree.clique(cid)
                    if _timed_out(cl):
                        up_msgs[cid] = LikelihoodMessage(
                            sender=cid, status=CliqStatus.ERROR_STATUS,
                            direction="up")
                        continue
                    child_msgs = [up_msgs[ch] for ch in cl.children
                                  if ch in up_msgs]
                    tr = trace_for(cid)
                    if fg.params.record_cliques:
                        tr.child_msgs = list(child_msgs)
                    if cid in segments:
                        try:
                            out = up_solve_segment(fg, tree, segments[cid],
                                                   child_msgs, solve_key,
                                                   trace_for)
                        except Exception as e:      # noqa: BLE001
                            logger.warning("fused segment failed (%s); "
                                           "falling back per-clique", e)
                            out = None
                        if out is not None:
                            up_msgs.update(out)
                            seg_handled.update(
                                c.cid for c in segments[cid])
                            continue
                    try:
                        # width-aware policy (VERDICT r4 item #3): narrow
                        # (unbatched) levels use the PARTICLE-sharding
                        # axis; wide levels above use clique batching
                        up_msgs[cid] = up_solve_clique(
                            fg, tree, cl, child_msgs, solve_key, trace=tr,
                            mesh=_particle_mesh(fg.params, mesh))
                    except Exception as e:          # noqa: BLE001
                        cl.status = CliqStatus.ERROR_STATUS
                        tr.log("error", str(e))
                        errors.append((cid, e))
                        up_msgs[cid] = LikelihoodMessage(
                            sender=cid, status=CliqStatus.ERROR_STATUS,
                            direction="up")
                continue
            cls = [tree.clique(cid) for cid in level]
            if any(_timed_out(cl) for cl in cls[:1]):
                for cl in cls:
                    cl.status = CliqStatus.ERROR_STATUS
                    up_msgs[cl.cid] = LikelihoodMessage(
                        sender=cl.cid, status=CliqStatus.ERROR_STATUS,
                        direction="up")
                continue
            child_msgs_of = {cl.cid: [up_msgs[ch] for ch in cl.children
                                      if ch in up_msgs] for cl in cls}
            if fg.params.record_cliques:
                for cl in cls:
                    trace_for(cl.cid).child_msgs = child_msgs_of[cl.cid]
            try:
                up_msgs.update(up_solve_level(
                    fg, tree, cls, child_msgs_of, solve_key, traces=traces,
                    mesh=mesh))
            except Exception as e:          # noqa: BLE001
                for cl in cls:
                    if cl.status != CliqStatus.UPSOLVED:
                        cl.status = CliqStatus.ERROR_STATUS
                        errors.append((cl.cid, e))
                        up_msgs[cl.cid] = LikelihoodMessage(
                            sender=cl.cid, status=CliqStatus.ERROR_STATUS,
                            direction="up")
    elif up:
        segments = (_find_up_segments(fg, tree, skip_set, delay_cliques,
                                      dev_of, solve_key)
                    if _use_sweep(fg.params) else {})
        seg_handled: set = set()
        for level in reversed(levels):
            for cid in level:
                if cid in seg_handled:
                    continue
                cl = tree.clique(cid)
                if _timed_out(cl):
                    up_msgs[cid] = LikelihoodMessage(
                        sender=cid, status=CliqStatus.ERROR_STATUS,
                        direction="up")
                    continue
                child_msgs = [up_msgs[ch] for ch in cl.children
                              if ch in up_msgs]
                tr = trace_for(cid)
                if fg.params.record_cliques:
                    tr.child_msgs = list(child_msgs)
                if cid in segments:
                    chain = segments[cid]
                    try:
                        out = up_solve_segment(fg, tree, chain, child_msgs,
                                               solve_key, trace_for)
                    except Exception as e:      # noqa: BLE001
                        logger.warning("fused segment failed (%s); "
                                       "falling back per-clique", e)
                        out = None
                    if out is not None:
                        up_msgs.update(out)
                        seg_handled.update(c.cid for c in chain)
                        continue
                if cid in skip_set:
                    tr.log("skip", "skip_cliques fault injection")
                    up_msgs[cid] = LikelihoodMessage(
                        sender=cid, status=cl.status or CliqStatus.NULL,
                        direction="up")
                    continue
                if cid in delay_cliques:
                    time.sleep(delay_cliques[cid])
                try:
                    up_msgs[cid] = up_solve_clique(
                        fg, tree, cl, child_msgs, solve_key, trace=tr,
                        device=dev_of.get(cid),
                        mesh=_particle_mesh(fg.params, mesh))
                except Exception as e:          # noqa: BLE001
                    cl.status = CliqStatus.ERROR_STATUS
                    tr.log("error", str(e))
                    errors.append((cid, e))
                    up_msgs[cid] = LikelihoodMessage(
                        sender=cid, status=CliqStatus.ERROR_STATUS,
                        direction="up")

    def _run_down_sweep() -> set:
        """One full root→leaves down sweep.  Returns the cids that were
        down-initialized (the reference tryDownInit_ outcome) — non-empty
        means the up pass must re-run over their ancestors so the newly
        usable subtree information reaches the rest of the tree."""
        down_msgs: Dict[int, LikelihoodMessage] = {}
        down_inited: set = set()
        # cliques whose down pass left their beliefs untouched: a recycled
        # child below such a clique sees the identical down message it saw
        # last solve, so its own down-solve can be skipped too (reference
        # incremental recycling semantics, CliqueStateMachine.jl:110-132)
        down_unchanged: set = set()
        wtol = getattr(fg.params, "wildfire_tol", 0.0)
        if isinstance(wtol, str) and wtol != "auto":
            raise ValueError(
                f"SolverParams.wildfire_tol={wtol!r}: expected a float "
                "tolerance, 0.0 (off — reference semantics), or \"auto\"")
        # under "auto" the summaries must be recorded even on solves where
        # the gate resolves OFF (first/under-crossover solves): without a
        # recorded baseline the first over-crossover solve could never
        # skip.  Recording is sync-free (device refs only); only the gate
        # CONSULT pays the device->host statistic read.
        record_summaries = wtol == "auto"
        if wtol == "auto":
            # enable the gate only past the measured crossover: its one
            # device->host statistic sync (~35-40 ms through the tunnel)
            # pays for itself once enough recycled descendants can skip
            # their down-solves (BASELINE "Wildfire gate: measured
            # crossover" — loses at 30 poses, wins 2.2x at 120 on TPU
            # v5e; crossover ~60-80 recycled cliques)
            n_recycled = sum(
                1 for c in tree.cliques.values()
                if c.is_recycled and c.status == CliqStatus.UPRECYCLED)
            wtol = (WILDFIRE_AUTO_TOL
                    if n_recycled >= WILDFIRE_AUTO_MIN_RECYCLED else 0.0)
        record_summaries = record_summaries or wtol > 0.0
        # gate instrumentation (VERDICT r2 item 5): how often the wildfire
        # statistic was consulted (each consult = one device->host scalar
        # sync) vs fired, and how many down-solves were skipped for free
        # via the exact parent-unchanged path
        wf = tree.wildfire_stats = {"exact_skips": 0, "stat_syncs": 0,
                                    "wildfire_skips": 0, "down_solves": 0}
        for level in levels:
            for cid in level:
                cl = tree.clique(cid)
                tr = trace_for(cid)
                if fg.params.record_cliques:
                    tr.down_msg = down_msgs.get(cid)
                if cid in skip_set or cl.status == CliqStatus.ERROR_STATUS:
                    continue
                if _timed_out(cl):
                    continue
                incoming = down_msgs.get(cid)
                summary = (_msg_summary(incoming)
                           if record_summaries and incoming is not None
                           else None)
                sig = cl.signature()
                parent_unchanged = (cl.parent is None
                                    or cl.parent in down_unchanged)
                skip_recycled = False
                if (wtol > 0.0 and cl.is_recycled
                        and cl.status == CliqStatus.UPRECYCLED):
                    # default (wtol=0) matches the reference: recycled
                    # cliques still re-run their down pass, only
                    # MARGINALIZED skips (CliqueStateMachine.jl:110-132)
                    if parent_unchanged:
                        # exact: parent's down pass left beliefs untouched
                        tr.log("recycle", "skip down-solve")
                        skip_recycled = True
                        wf["exact_skips"] += 1
                    elif summary is not None:
                        wf["stat_syncs"] += 1
                        if _wildfire_unchanged(summary,
                                               tree.down_cache.get(sig),
                                               wtol):
                            # wildfire: down message statistically unchanged
                            tr.log("recycle", "wildfire skip down-solve")
                            skip_recycled = True
                            wf["wildfire_skips"] += 1
                if summary is not None:
                    tree.down_cache[sig] = summary
                if skip_recycled:
                    cl.status = CliqStatus.DOWNSOLVED
                    for ch in tree.children(cid):
                        down_msgs[ch.cid] = prep_msg_down(
                            fg, cl, ch, CliqStatus.DOWNSOLVED, solve_key)
                    down_unchanged.add(cid)
                    continue
                if cl.is_marginalized:
                    down_unchanged.add(cid)
                child_up = [up_msgs[ch] for ch in cl.children
                            if ch in up_msgs]
                try:
                    wf["down_solves"] += 1
                    out = down_solve_clique(
                        fg, tree, cl, down_msgs.get(cid), solve_key,
                        child_msgs=child_up, trace=tr,
                        mesh=_particle_mesh(fg.params, mesh))
                    down_msgs.update(out)
                    if getattr(cl, "down_inited", False):
                        down_inited.add(cid)
                except Exception as e:          # noqa: BLE001
                    cl.status = CliqStatus.ERROR_STATUS
                    tr.log("error", str(e))
                    errors.append((cid, e))
        # received-down-message map (keyed by receiving clique) for
        # getCliqDownMsgsAfterDownSolve-style introspection
        tree.down_msgs = down_msgs
        return down_inited

    def _run_up_subset(only: set) -> None:
        """Re-run the up sweep over ``only`` (a down-inited clique set plus
        its ancestors), deepest level first; untouched cliques keep their
        retained up messages.  This is the re-up half of the reference's
        tree-init fixed point (waitForUp/initUp cycling,
        CliqueStateMachine.jl:341-417)."""
        for level in reversed(levels):
            for cid in level:
                if cid not in only or cid in skip_set:
                    continue
                cl = tree.clique(cid)
                if cl.status == CliqStatus.ERROR_STATUS or _timed_out(cl):
                    continue
                child_msgs = [up_msgs[ch] for ch in cl.children
                              if ch in up_msgs]
                tr = trace_for(cid)
                tr.log("re_up", "tree-init fixed point")
                try:
                    up_msgs[cid] = up_solve_clique(
                        fg, tree, cl, child_msgs, solve_key, trace=tr)
                except Exception as e:          # noqa: BLE001
                    cl.status = CliqStatus.ERROR_STATUS
                    tr.log("error", str(e))
                    errors.append((cid, e))
                    up_msgs[cid] = LikelihoodMessage(
                        sender=cid, status=CliqStatus.ERROR_STATUS,
                        direction="up")

    if down and not up:
        # down-only solve (reference tryDownSolveOnly_StateMachine CSM-2d,
        # CliqueStateMachine.jl:487-526): a clique that never up-solved
        # this round counts as UPRECYCLED when all its variables carry a
        # previous solution; otherwise the solve cannot proceed down-only
        for cl in tree.cliques.values():
            if cl.status in (CliqStatus.NULL, CliqStatus.NO_INIT,
                             CliqStatus.INITIALIZED):
                if all(fg.var(v).get_solved_count(solve_key) > 0
                       for v in cl.all_vars):
                    cl.status = CliqStatus.UPRECYCLED
                else:
                    raise RuntimeError(
                        f"down-only solve: clique {cl.cid} variables were "
                        "never solved (reference CSM-2d error path — set "
                        "upsolve=True)")

    if down:
        # Tree-init fixed point (reference CSM waitForUp/initUp/tryDownInit
        # cycling bounded by limittreeinit_iters,
        # CliqueStateMachine.jl:341-417, :573-585, :699-858): when a down
        # sweep initializes previously NO_INIT cliques, their subtree's
        # information has not yet reached the rest of the tree — re-run the
        # up sweep over those cliques and their ancestors, then sweep down
        # again, until no clique down-initializes (typical graphs: first
        # down sweep reports nothing and the loop exits after one pass).
        limit = max(1, int(getattr(fg.params, "limit_treeinit_iters", 10)))
        for init_iter in range(limit):
            down_inited = _run_down_sweep()
            if not down_inited or not up or errors:
                break
            affected: set = set()
            for cid in down_inited:
                cur: Optional[int] = cid
                while cur is not None and cur not in affected:
                    affected.add(cur)
                    cur = tree.clique(cur).parent
            logger.debug("tree-init pass %d: re-up over %d cliques",
                         init_iter + 1, len(affected))
            _run_up_subset(affected)
        still_no_init = [c.cid for c in tree.cliques.values()
                         if c.status == CliqStatus.NO_INIT]
        if still_no_init:
            logger.warning(
                "tree init incomplete after %d passes; cliques %s remain "
                "NO_INIT (graph lacks initializing information)",
                init_iter + 1, still_no_init)

    # retain the sweep's up messages for post-solve introspection
    # (reference getTreeCliqUpMsgsAll / stackCliqUpMsgsByVariable,
    # TreeDebugTools.jl / TreeMessageUtils.jl accessors)
    tree.up_msgs = up_msgs
    if errors:
        cids = [c for c, _ in errors]
        raise RuntimeError(
            f"clique solves failed for {cids}: {errors[0][1]}")             from errors[0][1]
    return traces


def _lockstep_gibbs(fg: FactorGraph, subs: Dict[int, FactorGraph],
                    cliques: List[Clique], solve_key: str) -> None:
    """Lock-step Gibbs across a level's cliques: position p of every
    clique's update sequence runs in the same round, and same-structure
    updates execute as ONE vmapped kernel (ops/fused.py
    fused_variable_update_batched) — the per-level batched clique solve of
    SURVEY.md §7.6.  Within a clique the update order is identical to the
    sequential path, so statistics match."""
    from ..beliefs import Belief as _B
    from ..ops.fused import (fused_variable_update,
                             fused_variable_update_batched)
    from ..ops.graphops import UpdatePlan, prepare_update

    params = fg.params
    sequences: Dict[int, List[str]] = {}
    for cl in cliques:
        seq = list(cl.direct_vars)
        for _ in range(params.gibbs_iters):
            seq.extend(cl.iter_vars)
        sequences[cl.cid] = seq
    max_len = max((len(s) for s in sequences.values()), default=0)

    for pos in range(max_len):
        todo = []                      # (cid, var)
        for cl in cliques:
            seq = sequences[cl.cid]
            if pos < len(seq):
                var = seq[pos]
                if not subs[cl.cid].var(var).marginalized:
                    todo.append((cl.cid, var))

        plans, metas = [], []
        for cid, var in todo:
            sub = subs[cid]
            plan = prepare_update(sub, var, sub.factors_of(var),
                                  solve_key=solve_key)
            if isinstance(plan, UpdatePlan):
                plans.append(plan)
                metas.append((cid, var))
            # passthrough (no factors): nothing to update

        # group same-structure plans and execute batched
        groups: Dict = {}
        for plan, meta in zip(plans, metas):
            groups.setdefault(plan.structure_key, []).append((plan, meta))

        for entries in groups.values():
            keys = [subs[cid].next_key() for _, (cid, _) in entries]
            if len(entries) == 1:
                plan, (cid, var) = entries[0]
                pts, bw = fused_variable_update(
                    plan.manifold, plan.models, plan.nested,
                    plan.old_points, plan.specs, plan.masks, keys[0],
                    plan.n_out)
                subs[cid].set_belief(var, pts, solve_key=solve_key, bw=bw,
                                     ipc=plan.ipc())
            else:
                pl = [e[0] for e in entries]
                pts_b, bw_b = fused_variable_update_batched(pl, keys)
                for i, (plan, (cid, var)) in enumerate(entries):
                    subs[cid].set_belief(var, pts_b[i], solve_key=solve_key,
                                         bw=bw_b[i], ipc=plan.ipc())


def up_solve_level(fg: FactorGraph, tree: BayesTree, cliques: List[Clique],
                   child_msgs_of: Dict[int, List[LikelihoodMessage]],
                   solve_key: str = "default",
                   traces: Optional[Dict[int, CliqueTrace]] = None,
                   mesh=None
                   ) -> Dict[int, LikelihoodMessage]:
    """Batched up-solve of one level: subgraphs + messages + init on host,
    then lock-step batched Gibbs, then messages out."""
    traces = traces or {}
    out: Dict[int, LikelihoodMessage] = {}
    active: List[Clique] = []
    subs: Dict[int, FactorGraph] = {}

    for cl in cliques:
        t = traces.get(cl.cid) or CliqueTrace(cl.cid)
        if cl.is_marginalized or (cl.is_recycled and
                                  cl.status == CliqStatus.UPRECYCLED):
            t.log("recycle", "skip up-solve")
            msg = LikelihoodMessage(sender=cl.cid, status=cl.status,
                                    direction="up")
            for vlbl in cl.separator:
                msg.beliefs[vlbl] = fg.get_belief(vlbl, solve_key)
            out[cl.cid] = msg
            continue
        sub = build_clique_subgraph(fg, cl)
        for msg in child_msgs_of.get(cl.cid, []):
            if msg.status == CliqStatus.ERROR_STATUS:
                cl.status = CliqStatus.ERROR_STATUS
                raise RuntimeError(
                    f"clique {cl.cid}: child {msg.sender} errored")
            add_msg_factors(sub, msg)
        ok = _cycle_init_by_var_order(sub, cl, solve_key)
        if not ok:
            t.log("no_init")
            cl.status = CliqStatus.NO_INIT
            out[cl.cid] = prep_msg_up(sub, cl, CliqStatus.NO_INIT, solve_key)
            transfer_update_subgraph(fg, sub, cl.frontals, solve_key)
            continue
        subs[cl.cid] = sub
        active.append(cl)

    if active:
        if getattr(fg.params, "batch_stacked", True):
            _lockstep_gibbs_stacked(fg, subs, active, solve_key, mesh=mesh)
        else:
            _lockstep_gibbs(fg, subs, active, solve_key)

    for cl in active:
        t = traces.get(cl.cid) or CliqueTrace(cl.cid)
        cl.status = CliqStatus.UPSOLVED
        out[cl.cid] = prep_msg_up(subs[cl.cid], cl, CliqStatus.UPSOLVED,
                                  solve_key)
        transfer_update_subgraph(fg, subs[cl.cid], cl.frontals, solve_key)
        t.log("up_done", "batched level solve")
    return out


def _clique_class_signature(sub: FactorGraph, clique: Clique, solve_key: str):
    """Canonical isomorphism signature of a clique's local solve structure:
    cliques with equal signatures run their whole Gibbs schedules stacked."""
    from jax import tree_util

    from ..ops.convolve import make_conv_spec, null_surplus_map

    local = {v: i for i, v in enumerate(clique.all_vars)}
    sig = []
    params = sub.params
    seq = list(clique.direct_vars) + [v for _ in range(params.gibbs_iters)
                                      for v in clique.iter_vars]
    for var in seq:
        fs = _canonical_factors(sub, var)
        nsrp = null_surplus_map(params, fs)
        fsig = []
        for f in fs:
            spec = make_conv_spec(sub, f, var, null_surplus=nsrp[f.label])
            fsig.append((tree_util.tree_structure(f.model),
                         tuple(local[v] for v in f.variables
                               if v in local), spec))
        v = sub.var(var)
        sig.append((local[var], v.N, v.manifold, tuple(fsig)))
    return tuple(sig)


def _canonical_factors(sub: FactorGraph, var: str):
    from ..ops.graphops import _solvable_factors
    fs = _solvable_factors(sub, sub.factors_of(var))
    fs.sort(key=lambda f: (type(f.model).__name__, len(f.variables),
                           f.variables.index(var)
                           if var in f.variables else -1,
                           f.multihypo or (), f.nullhypo))
    return fs


def _lockstep_gibbs_stacked(fg: FactorGraph, subs: Dict[int, FactorGraph],
                            cliques: List[Clique], solve_key: str,
                            mesh=None) -> None:
    """Stacked-store lock-step Gibbs: isomorphic cliques keep their variable
    particles in (B, N, pd) stacks for the whole schedule — stacking happens
    once per level, every Gibbs round is one vmapped kernel per class
    (SURVEY.md §7.6 batched clique kernels, second generation)."""
    import jax.numpy as jnp

    from ..ops.convolve import (make_conv_spec, null_surplus_map,
                                static_dim_mask)
    from ..ops.fused import _fused_fn_batched
    from ..ops.graphops import _ipc_of

    # group cliques by local structure
    classes: Dict = {}
    for cl in cliques:
        sig = _clique_class_signature(subs[cl.cid], cl, solve_key)
        classes.setdefault(sig, []).append(cl)

    for sig, members in classes.items():
        if len(members) == 1:
            # singleton: plain sequential fused path
            cl = members[0]
            sub = subs[cl.cid]
            _gibbs_solve(sub, cl, list(cl.direct_vars), 1, solve_key)
            if cl.iter_vars:
                _gibbs_solve(sub, cl, cl.iter_vars,
                             sub.params.gibbs_iters, solve_key)
            continue

        B = len(members)
        # mesh: pad the clique axis to a device multiple and shard it —
        # each device runs its slice of the isomorphism class (the
        # reference's WorkerPool clique distribution as a batch axis)
        stackees = list(members)
        shard = None
        # narrow classes skip sharding: padding replicates members[-1] so a
        # B < devices level would run up to devices-1 extra full clique
        # solves plus a device_put reshard of every stacked array for zero
        # parallel win (advisor r2)
        if mesh is not None and B >= int(mesh.devices.size):
            per = int(mesh.devices.size)
            Bp = -(-B // per) * per
            stackees = stackees + [members[-1]] * (Bp - B)

            from jax.sharding import NamedSharding, PartitionSpec

            def shard(x):
                spec = PartitionSpec(mesh.axis_names[0],
                                     *([None] * (jnp.ndim(x) - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))
        Bs = len(stackees)
        rep = members[0]
        rep_sub = subs[rep.cid]
        var_order = rep.all_vars                     # local ids by position
        # one-time stack of every clique variable's points: (B, N, pd)
        store = {i: jnp.stack([subs[m.cid].points(m.all_vars[i], solve_key)
                               for m in stackees])
                 for i in range(len(var_order))}
        if shard is not None:
            store = {i: shard(p) for i, p in store.items()}
        bw_out: Dict[int, jnp.ndarray] = {}
        ipc_out: Dict[int, jnp.ndarray] = {}

        params = rep_sub.params
        seq = list(rep.direct_vars) + [v for _ in range(params.gibbs_iters)
                                       for v in rep.iter_vars]
        local = {v: i for i, v in enumerate(var_order)}

        # per-round templates from the representative
        for var in seq:
            li = local[var]
            fs = _canonical_factors(rep_sub, var)
            if not fs:
                continue
            specs, masks, models_stacked, nested = [], [], [], []
            manifold = rep_sub.var(var).manifold
            nsrp = null_surplus_map(params, fs)
            for f in fs:
                spec = make_conv_spec(rep_sub, f, var,
                                      null_surplus=nsrp[f.label])
                specs.append(spec)
                masks.append(static_dim_mask(manifold, spec.partial_dims))
                # stack this factor's model across members (same label
                # exists in every isomorphic sub by construction)
                mstack = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[subs[m.cid].factor(_match_factor(subs[m.cid],
                                                       m, rep, f)).model
                      for m in stackees])
                if shard is not None:
                    mstack = jax.tree.map(shard, mstack)
                models_stacked.append(mstack)
                nested.append(tuple(store[local[v]] for v in f.variables))
            fn = _fused_fn_batched(manifold, tuple(specs), tuple(masks),
                                   rep_sub.var(var).N)
            keys = jax.random.split(fg.next_key(), Bs)
            if shard is not None:
                keys = shard(keys)
            pts, bw = fn(tuple(models_stacked), tuple(nested), store[li],
                         keys)
            store[li] = pts
            bw_out[li] = bw
            ipc_out[li] = _ipc_of(tuple(masks))

        # unstack once: write every member's beliefs back
        for b, m in enumerate(members):
            sub = subs[m.cid]
            for i, vname_rep in enumerate(var_order):
                if i not in bw_out:
                    continue
                var_name = m.all_vars[i]
                sub.set_belief(var_name, store[i][b], solve_key=solve_key,
                               bw=bw_out[i][b], ipc=ipc_out[i])


def _match_factor(sub: FactorGraph, member: Clique, rep: Clique, rep_factor):
    """Map a representative clique's factor to the member's corresponding
    factor via local variable positions."""
    local_rep = {v: i for i, v in enumerate(rep.all_vars)}
    want = tuple(local_rep[v] for v in rep_factor.variables
                 if v in local_rep)
    want_type = type(rep_factor.model).__name__
    local_mem = {v: i for i, v in enumerate(member.all_vars)}
    for fl in sub.lsf():
        f = sub.factor(fl)
        if type(f.model).__name__ != want_type:
            continue
        got = tuple(local_mem[v] for v in f.variables if v in local_mem)
        if got == want and (f.multihypo or ()) == \
                (rep_factor.multihypo or ()) and \
                f.nullhypo == rep_factor.nullhypo:
            return fl
    raise KeyError(f"no isomorphic factor for {rep_factor.label}")
