"""Batch parametric solver: damped Gauss-Newton / LM over tangent state.

TPU-native rebuild of the reference's parametric stack
(src/parametric/services/ParametricUtils.jl solveGraphParametricOptim,
ParametricManopt.jl solve_RLM): the graph's variables flatten into one
tangent coordinate vector at per-variable linearization points; factors
stack into *type-homogeneous groups* (the reference's ArrayPartition
grouping, ParametricUtils.jl:205-220) whose residuals evaluate as one vmap
per group; whitened residuals feed a jitted Levenberg-Marquardt loop with
jacobians by ``jax.jacfwd`` (the reference uses FiniteDiff) and analytic
covariance Σ = (JᵀJ)⁻¹ (ParametricManopt.jl:360-374).

Max-mixture (reference MaxMixture, src/services/MaxMixture.jl): Mixture
factors contribute the best-component residual via a smooth-free argmin
select inside the vmapped group evaluation.

Size bucketing — XLA programs survive graph growth: every traced shape is
padded to a geometric bucket (variables per manifold type; factors per
group), variable/column indices are traced arrays (one-hot matmul gathers,
never data-dependent index gathers), and the frozen/padded coordinate set
is a traced {0,1} mask folded into the normal equations as
``H' = mmᵀ⊙H + diag(1-m)`` (exactly the reduced system, since frozen rows
decouple).  A growing graph therefore re-enters the SAME compiled LM step
until a bucket overflows — O(log n) compilations over a whole trajectory
instead of one ~minute XLA compile per added pose.  Padded factor rows
carry zero whitening so they contribute nothing to cost, gradient, or
Hessian; padded variable coordinates are masked frozen.

Multi-chip: the group evaluation is embarrassingly data-parallel over
factors — parallel/mesh.py shards factor groups across the device mesh and
psums JᵀJ/Jᵀr (SURVEY.md §2.9 mapping of process-distributed solves onto
collectives).
"""

from __future__ import annotations

import copy
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import FactorGraph
from ..models.factors import GenericMarginal, MetaPrior, Mixture
from ..ops.hypo import parse_multihypo

__all__ = ["ParametricProblem", "solve_graph_parametric",
           "solve_conditionals_parametric", "autoinit_parametric",
           "init_parametric_from", "solve_problems_batched"]


def _sqrt_inv(cov: jnp.ndarray) -> jnp.ndarray:
    """Whitening matrix W with Wᵀ W = Σ⁻¹ (inverse Cholesky factor)."""
    L = jnp.linalg.cholesky(cov + 1e-10 * jnp.eye(cov.shape[-1]))
    return jnp.linalg.inv(L)


@jax.jit
def _sqrt_inv_stacked(covs: jnp.ndarray) -> jnp.ndarray:
    """Batched whitening — one dispatch for a whole factor stack instead of
    two linalg dispatches per factor (expensive over a tunneled TPU)."""
    return jax.vmap(_sqrt_inv)(covs)


@jax.jit
def _sqrt_inv_masked(covs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Whitening + pad-row zeroing in ONE dispatch — the trailing eager
    multiply was the last per-group eager op on the warm parametric path
    (tests/test_dispatch_budget.py)."""
    return jax.vmap(_sqrt_inv)(covs) * mask


# geometric size buckets (~×1.4) with a floor of 4: padding waste ≤ ~40%,
# O(log n) distinct compiled programs as a graph grows (the floor makes
# tiny problems — autoinit conditionals, small cliques — share one shape)
_BUCKETS = [4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256,
            384, 512, 768, 1024, 1536, 2048, 3072, 4096]


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if b >= n:
            return b
    return int(2 ** int(np.ceil(np.log2(max(n, 1)))))


def _pad_rows(x: jnp.ndarray, pad: int, zero: bool = False) -> jnp.ndarray:
    if pad == 0:
        return jnp.asarray(x)
    x = jnp.asarray(x)
    tail = (jnp.zeros_like(x[-1:]) if zero else x[-1:])
    return jnp.concatenate([x, jnp.repeat(tail, pad, axis=0)])


# content-keyed cache of stacked factor groups (see _build_groups); value
# holds refs to the member models so their ids stay unique while cached.
#
# IMMUTABILITY CONTRACT: keys include id(f.model), so factor models must be
# treated as immutable once added to a graph — mutate a model's
# mean/cov in place and this cache (and the parametric up-message recycle
# cache, parametric/cliques.py) will serve stale stacked arrays.  Replace
# the factor with a new model object instead (matches the reference, where
# measurement edits go through rebuildFactorMetadata!/new DFGFactor data).
# Call :func:`reset_group_cache` to drop all cached device arrays (e.g.
# after discarding many graphs, or in long-lived processes where the
# 4096-entry LRU pin is unwanted).
from collections import OrderedDict as _OrderedDict

_GROUP_CACHE: "_OrderedDict[tuple, tuple]" = _OrderedDict()
_GROUP_CACHE_MAX = 4096


def reset_group_cache() -> None:
    """Drop every cached stacked factor group (device arrays included).
    Use after in-place model mutation (discouraged — see the immutability
    contract above) or to release device memory pinned by the LRU."""
    _GROUP_CACHE.clear()


@functools.partial(jax.jit, static_argnames=("pad",))
def _stack_group_plain(models_tuple, pad):
    """Stack a plain (non-mixture) factor group's model leaves and
    measurement moments in ONE dispatch: the eager per-leaf
    jnp.stack/mean_cov path cost ~12 device round-trips per group, which
    dominated fresh-graph parametric solves (profiled 0.37 s of 0.72 s
    on the wide-32 forest).  Returns (stacked models, meas (Fb, z),
    covs (Fb, z, z)) with ``pad`` rows repeating the last real row."""
    def ps(xs, zero=False):
        xs = list(xs)
        tail = jnp.zeros_like(xs[-1]) if zero else xs[-1]
        return jnp.stack(xs + [tail] * pad)

    if len(models_tuple) > 1:
        models = jax.tree.map(lambda *xs: ps(list(xs)), *models_tuple)
    else:
        models = jax.tree.map(lambda x: ps([x]), models_tuple[0])
    mus, covs = zip(*(m.mean_cov() for m in models_tuple))
    return models, ps(list(mus)), ps(list(covs))


def _model_content_key(f):
    """Content digest of a factor model's HOST leaves (cached on the
    factor under the immutability contract).  Device-resident leaves
    would require a blocking device→host transfer to hash — those models
    key by object identity instead (still correct, just no cross-object
    sharing)."""
    dig = getattr(f, "_model_digest", None)
    if dig is not None:
        return dig
    import hashlib

    h = hashlib.blake2b(digest_size=12)
    h.update(type(f.model).__name__.encode())
    for x in jax.tree.leaves(f.model):
        if isinstance(x, (bool, int, float)):
            h.update(repr(x).encode())
        elif isinstance(x, np.ndarray):
            h.update(x.tobytes())
            h.update(str(x.shape).encode())
        elif isinstance(x, jnp.ndarray):
            # committed device array: hashing means a transfer — fall
            # back to identity for this model
            f._model_digest = ("id", id(f.model))
            return f._model_digest
        else:
            try:
                h.update(repr(x).encode())
            except Exception:                 # noqa: BLE001
                f._model_digest = ("id", id(f.model))
                return f._model_digest
    f._model_digest = ("h", h.digest())
    return f._model_digest


class _Group:
    """A stack of same-structure factors: vmapped residual evaluation.

    Stacked arrays are padded on the factor axis to a bucket size; padded
    rows have ``sqrt_inv = 0`` so their (whitened) residuals and jacobians
    vanish identically.
    """

    def __init__(self, models, meas, sqrt_inv, var_slots, mix=None,
                 tdofs=(), arg_manifolds=(), arg_types=(), hyp=None,
                 null_p=None):
        self.models = models          # pytree with leading factor axis (F,)
        self.meas = meas              # (F, zdim)
        self.sqrt_inv = sqrt_inv      # (F, zdim, zdim); zero rows = padding
        self.var_slots = var_slots    # (F, arity) int32 — index WITHIN the
        #                               arg's manifold-type block (traced)
        self.mix = mix                # optional (w (F,C), mus (F,C,z), sqi (F,C,z,z))
        self.hyp = hyp                # optional multihypo
        #                               (w (F,H), hyp_slots (F,H), upos)
        self.null_p = null_p          # (F,) per-factor nullhypo prob
        self.tdofs = tdofs            # static per-arg tangent dofs
        self.arg_manifolds = arg_manifolds   # static per-arg manifolds
        self.arg_types = arg_types    # static per-arg manifold-type index
        self.row_base = 0             # global residual row offset


class ParametricProblem:
    """Flattened tangent-space NLLS problem over a (sub)graph.

    State layout: variables are grouped by manifold type; each type block
    is ``bucket(count) * dof`` contiguous tangent coordinates (padded slots
    masked frozen).  Problems whose type/group buckets match share one
    compiled LM step regardless of exact variable/factor counts or which
    coordinates are frozen.
    """

    def __init__(self, fg: FactorGraph,
                 variables: Optional[Sequence[str]] = None,
                 factors: Optional[Sequence[str]] = None,
                 frozen: Sequence[str] = (),
                 solve_key: str = "parametric"):
        self.fg = fg
        self.solve_key = solve_key

        labels = list(variables or fg.ls())
        # group variables by manifold type (stable within a type)
        by_man: Dict = {}
        for v in labels:
            by_man.setdefault(fg.var(v).manifold, []).append(v)

        # type_groups: (manifold, n_real, n_bucket, tangent_base)
        self.type_groups: List[Tuple] = []
        self.var_labels: List[str] = []
        type_of: Dict[str, int] = {}
        idx_in_type: Dict[str, int] = {}
        base = 0
        for t, (man, vs) in enumerate(by_man.items()):
            nb = _bucket(len(vs))
            self.type_groups.append((man, len(vs), nb, base))
            for j, v in enumerate(vs):
                type_of[v] = t
                idx_in_type[v] = j
                self.var_labels.append(v)
            base += nb * man.dof
        self.total_dof = base
        self._type_of = type_of
        self._idx_in_type = idx_in_type

        self.manifolds = [fg.var(v).manifold for v in self.var_labels]
        self.dofs = [m.dof for m in self.manifolds]
        # per-REAL-variable global tangent offsets (within padded layout)
        offs = []
        for v in self.var_labels:
            man, _, _, tbase = self.type_groups[type_of[v]]
            offs.append(tbase + idx_in_type[v] * man.dof)
        self.offsets = np.asarray(offs + [self.total_dof])
        self.slot = {v: i for i, v in enumerate(self.var_labels)}

        # free mask over padded tangent coords: 0 = frozen or padding
        mask = np.zeros(self.total_dof, np.float32)
        frozen = set(frozen)
        for i, v in enumerate(self.var_labels):
            if v in frozen:
                continue
            s = int(self.offsets[i])
            mask[s:s + self.dofs[i]] = 1.0
        self.free_mask = jnp.asarray(mask)

        # linearization points: parametric point > belief mean > identity.
        # Rows stay host/numpy if they arrive that way — _p0_stacked uploads
        # the whole stack in one transfer (per-variable jnp.asarray here
        # would pay one tunnel dispatch per variable per problem build)
        p0 = []
        for v, m in zip(self.var_labels, self.manifolds):
            var = fg.var(v)
            if var.parametric_point is not None:
                p0.append(var.parametric_point)
            elif var.is_initialized():
                p0.append(m.mean(var.belief().points))
            else:
                p0.append(m.identity())
        self.p0 = list(p0)

        self.groups = self._build_groups(factors)

    # -- factor grouping --------------------------------------------------
    def _build_groups(self, factors) -> List[_Group]:
        from jax import tree_util
        buckets: Dict[Tuple, List] = {}
        flabels = list(factors or self.fg.lsf())
        for fl in flabels:
            f = self.fg.factor(fl)
            if isinstance(f.model, (MetaPrior, GenericMarginal)):
                continue
            if f.solvable <= 0:
                continue
            if any(v not in self.slot for v in f.variables):
                continue
            model = f.model
            is_mix = isinstance(model, Mixture)
            mh = parse_multihypo(f.multihypo)
            if mh is not None and is_mix:
                raise NotImplementedError(
                    "parametric Mixture+multihypo on one factor — use the "
                    "nonparametric solver (the reference's parametric "
                    "multihypo is likewise unimplemented, MaxMixture.jl)")
            # condensed arg layout for multihypo: certain vars in order
            # plus ONE uncertain slot (candidates must be contiguous and
            # share a manifold) — reference parseusermultihypo semantics,
            # FactorGraph.jl:634-654
            if mh is not None:
                certain, uncertain, weights = mh
                if tuple(uncertain) != tuple(range(uncertain[0],
                                                   uncertain[0] + len(uncertain))):
                    raise ValueError("multihypo candidates must be contiguous")
                cond_idx = [i for i in certain if i < uncertain[0]] \
                    + [uncertain[0]] \
                    + [i for i in certain if i > uncertain[-1]]
                upos = cond_idx.index(uncertain[0])
                mans_u = {self.manifolds[self.slot[f.variables[i]]]
                          for i in uncertain}
                if len(mans_u) != 1:
                    raise ValueError("multihypo candidates must share a manifold")
                mh_key = (len(uncertain), upos, tuple(weights))
                argman = tuple(self.manifolds[self.slot[f.variables[i]]]
                               for i in cond_idx)
            else:
                mh_key = None
                argman = tuple(self.manifolds[self.slot[v]]
                               for v in f.variables)
            treedef = tree_util.tree_structure(model)
            key = (treedef, len(f.variables), is_mix, mh_key, argman)
            buckets.setdefault(key, []).append(f)

        groups = []
        for (treedef, arity, is_mix, mh_key, argman), fs in buckets.items():
            nf = len(fs)
            fb = _bucket(nf)
            pad = fb - nf
            if mh_key is not None:
                certain0, uncertain0, _ = parse_multihypo(fs[0].multihypo)
                cond_idx = [i for i in certain0 if i < uncertain0[0]] \
                    + [uncertain0[0]] \
                    + [i for i in certain0 if i > uncertain0[-1]]
                slots_py = [[self._idx_in_type[f.variables[i]]
                             for i in cond_idx] for f in fs]
                hyp_py = tuple(
                    (tuple(parse_multihypo(f.multihypo)[2]),
                     tuple(self._idx_in_type[f.variables[i]]
                           for i in parse_multihypo(f.multihypo)[1]))
                    for f in fs)
                arg_vars0 = [fs[0].variables[i] for i in cond_idx]
            else:
                cond_idx = None
                slots_py = [[self._idx_in_type[v] for v in f.variables]
                            for f in fs]
                hyp_py = None
                arg_vars0 = fs[0].variables
            # per-arg manifold-TYPE indices are problem-layout dependent
            # (type_groups insertion order differs across subgraphs) — they
            # must be part of the cache key, not just the manifolds
            arg_types = tuple(self._type_of[v] for v in arg_vars0)

            # content-keyed group cache (the parametric analogue of the
            # nonparametric chain-plan cache): a clique re-solve over the
            # SAME factors — incremental growth, repeated solves, the
            # down sweep over the up sweep's subgraphs, fresh builds of
            # identical graphs — reuses the stacked/padded/whitened
            # device arrays instead of re-running ~10 eager dispatches
            # per group per solve.  Keyed by a CONTENT digest of each
            # model's host leaves (advisor r2's suggested alternative to
            # id(); falls back to object identity for device-resident
            # leaves, where hashing would block on a transfer) +
            # everything else the stack depends on.
            ck = (treedef, arity, is_mix, mh_key, argman, fb, arg_types,
                  tuple(_model_content_key(f) for f in fs),
                  tuple(f.nullhypo for f in fs),
                  tuple(map(tuple, slots_py)), hyp_py)
            hit = _GROUP_CACHE.get(ck)
            if hit is not None:
                _GROUP_CACHE.move_to_end(ck)
                groups.append(copy.copy(hit[0]))    # own row_base
                continue

            def pstack(xs, pad=pad, zero=False):
                """One stack op per leaf, padding folded into the stack
                list (repeat last real row; see NaN note below)."""
                xs = [jnp.asarray(x) for x in xs]
                tail = jnp.zeros_like(xs[-1]) if zero else xs[-1]
                return jnp.stack(list(xs) + [tail] * pad)

            plain = not is_mix
            if plain:
                # fused single-dispatch stack of model leaves + moments
                # (the eager path below costs ~12 round-trips per group)
                models, meas_s, covs_s = _stack_group_plain(
                    tuple(f.model for f in fs), pad)
            else:
                models = jax.tree.map(lambda *xs: pstack(xs),
                                      *[f.model for f in fs]) \
                    if nf > 1 else jax.tree.map(
                        lambda x: pstack([x]), fs[0].model)
            hyp = None
            if mh_key is not None:
                nu, upos, weights = mh_key
                hs = np.asarray([h[1] for h in hyp_py], np.int32)
                ws = np.asarray([h[0] for h in hyp_py], np.float32)
                hyp_slots = jnp.asarray(np.concatenate(
                    [hs, np.repeat(hs[-1:], pad, 0)]) if pad else hs)
                w_rows = jnp.asarray(np.concatenate(
                    [ws, np.repeat(ws[-1:], pad, 0)]) if pad else ws)
                hyp = (w_rows, hyp_slots, upos)
            # pad by REPEATING the last real row: padded rows then evaluate
            # a duplicate of a real factor (finite residual/jacobian) and
            # their zero whitening cancels the contribution — padding with
            # arbitrary slots could hit degenerate geometry (e.g. a
            # relative factor on a variable against itself) whose jacobian
            # is NaN, and 0·NaN poisons the Hessian
            sl = np.asarray(slots_py, np.int32)
            if pad:
                sl = np.concatenate([sl, np.repeat(sl[-1:], pad, 0)])
            slots = jnp.asarray(sl)
            tdofs = tuple(self.fg.var(v).manifold.dof for v in arg_vars0)
            arg_manifolds = tuple(self.fg.var(v).manifold for v in arg_vars0)
            # pad BEFORE whitening so _sqrt_inv_stacked sees the bucketed
            # shape (whitening the raw stack would recompile per exact
            # factor count, defeating the bucketing); pad rows duplicate
            # the last real cov (valid SPD input), then zero out
            pad_mask = np.ones((fb,) + (1,) * 2, np.float32)
            pad_mask[nf:] = 0.0
            mix = None
            if is_mix:
                ws, mus, cs = zip(*(f.model.mixture_mean_cov() for f in fs))
                covs = pstack(cs)                        # (Fb, C, z, z)
                C_ = covs.shape[1]
                sqis = _sqrt_inv_masked(
                    covs.reshape(fb * C_, *covs.shape[2:]),
                    np.repeat(pad_mask, C_, axis=0)     # host-side numpy
                ).reshape(covs.shape)
                mix = (pstack(ws), pstack(mus), sqis)
                # meas/sqrt_inv unused on the mixture path (per-component
                # mus/whiteners live in ``mix``)
                meas = mix[1][:, 0]
                sqi = mix[2][:, 0]
            else:
                meas = meas_s
                sqi = _sqrt_inv_masked(covs_s, pad_mask)
            np_null = np.asarray([f.nullhypo for f in fs], np.float32)
            null_p = jnp.asarray(np.concatenate([np_null,
                                                 np.zeros(pad, np.float32)])
                                 if pad else np_null)
            g = _Group(models, meas, sqi, slots, mix,
                       tdofs=tdofs, arg_manifolds=arg_manifolds,
                       arg_types=arg_types, hyp=hyp, null_p=null_p)
            groups.append(g)
            _GROUP_CACHE[ck] = (copy.copy(g), [f.model for f in fs])
            while len(_GROUP_CACHE) > _GROUP_CACHE_MAX:
                _GROUP_CACHE.popitem(last=False)
        # assign global residual row offsets
        base = 0
        for g in groups:
            g.row_base = base
            base += g.meas.shape[0] * g.meas.shape[1]
        self.n_residuals = base
        return groups

    # -- state <-> points -------------------------------------------------
    def points_of(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        pts = []
        for i, (m, p) in enumerate(zip(self.manifolds, self.p0)):
            s = int(self.offsets[i])
            pts.append(m.exp(p, x[s:s + m.dof]))
        return pts

    def _real_layout(self) -> Tuple:
        """Static (type, index-in-type) row per REAL variable — the part of
        the problem's layout the pytree treedef deliberately drops
        (aux keeps only padded buckets).  Batch grouping keys on this so
        problems sharing padded shapes but differing in real-variable
        count are never assembled from another problem's layout."""
        return tuple((self._type_of[v], self._idx_in_type[v])
                     for v in self.var_labels)

    def _p0_layout(self) -> Tuple[Tuple, Tuple, Tuple]:
        """Static inputs of the jitted p0 bucketing: per-type slot lists,
        manifolds, and bucket sizes (single source for the eager
        ``_p0_stacked``, ``_p0_stack_single``, and ``_batch_prep``)."""
        layout = tuple(
            tuple(self.slot[v] for v in self.var_labels
                  if self._type_of[v] == t)
            for t in range(len(self.type_groups)))
        men = tuple(tg[0] for tg in self.type_groups)
        nbs = tuple(tg[2] for tg in self.type_groups)
        return layout, men, nbs

    def _p0_stacked(self, p0=None) -> Tuple[jnp.ndarray, ...]:
        """Per-manifold-type stacked linearization points, padded to the
        type bucket with identity points: tuple of (bucket_t, pdim_t)."""
        p0 = self.p0 if p0 is None else p0
        stacks = []
        for t, (man, n, nb, _) in enumerate(self.type_groups):
            rows = [p0[self.slot[v]] for v in self.var_labels
                    if self._type_of[v] == t]
            ident = man.identity()
            rows = rows + [ident] * (nb - len(rows))
            stacks.append(jnp.stack([jnp.asarray(r) for r in rows]))
        return tuple(stacks)

    def _x_blocks(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        """Static-sliced per-type tangent blocks reshaped (bucket, dof)."""
        out = []
        for man, _, nb, tbase in self.type_groups:
            out.append(x[tbase:tbase + nb * man.dof].reshape(nb, man.dof))
        return tuple(out)

    def _retract_stacked(self, x: jnp.ndarray, p0s) -> Tuple[jnp.ndarray, ...]:
        """exp each variable's tangent slice at its linearization row — one
        vmap per manifold type (no per-variable Python loop)."""
        outs = []
        for t, (man, _, nb, tbase) in enumerate(self.type_groups):
            xt = x[tbase:tbase + nb * man.dof].reshape(nb, man.dof)
            outs.append(jax.vmap(man.exp)(p0s[t], xt))
        return tuple(outs)

    def _select_hypo_slots(self, g: _Group, x: jnp.ndarray, p0s):
        """Max-multihypo data association (the reference's MaxMultihypo is
        unimplemented WIP, src/services/MaxMixture.jl): score every
        candidate assignment of the uncertain slot by its whitened residual
        minus log-weight, argmin-select per factor, and return the
        *effective* slot matrix. Selection happens outside the residual
        closure, so the subsequent linearization and jacobian column
        placement see a fixed association (select-then-linearize; the
        association can switch between LM iterations)."""
        w, hyp_slots, upos = g.hyp
        H = hyp_slots.shape[1]
        scores = []
        for h in range(H):                  # H is small and static
            slots_h = jnp.concatenate(
                [g.var_slots[:, :upos], hyp_slots[:, h:h + 1],
                 g.var_slots[:, upos + 1:]], axis=1)
            r_h = self._eval_slots(g, slots_h, x, p0s, with_jac=False)
            scores.append(0.5 * jnp.sum(r_h * r_h, axis=-1)
                          - jnp.log(jnp.maximum(w[:, h], 1e-30)))
        sel = jnp.argmin(jnp.stack(scores, axis=1), axis=1)      # (F,)
        sel_slot = jnp.sum(
            hyp_slots * jax.nn.one_hot(sel, H, dtype=g.meas.dtype),
            axis=1).astype(jnp.int32)
        return jnp.concatenate(
            [g.var_slots[:, :upos], sel_slot[:, None],
             g.var_slots[:, upos + 1:]], axis=1)

    def _group_res(self, g: _Group, x: jnp.ndarray, p0s, with_jac: bool):
        """(result, slots_used): result is (r (F, z) [, J (F, z,
        local_dof)]) with *local* jacobians — the jacfwd width is the
        factor's own tangent dims, so compile time is independent of the
        graph size (the reference's sparse-jacobian design,
        ParametricManopt.jl:153-231, done with one-hot matmul gathers
        instead of graph coloring).  slots_used feeds the jacobian column
        placement (differs from g.var_slots for multihypo groups)."""
        slots = g.var_slots
        if g.hyp is not None:
            slots = self._select_hypo_slots(g, x, p0s)
        out = self._eval_slots(g, slots, x, p0s, with_jac)
        r = out[0] if with_jac else out
        # max-nullhypo outlier gate (the reference's MaxNullhypo is WIP,
        # src/services/MaxMixture.jl): the null alternative has likelihood
        # p vs the factor's (1-p)*N(r;0,I) — when 0.5|r|^2 - log(1-p)
        # exceeds -log(p) the null wins and the factor contributes nothing
        # this iteration (gate re-evaluates every LM iteration)
        p_null = g.null_p
        thresh = jnp.log(jnp.maximum(1.0 - p_null, 1e-9)) \
            - jnp.log(jnp.maximum(p_null, 1e-30))
        keep = jnp.where(p_null > 0.0,
                         0.5 * jnp.sum(r * r, axis=-1) <= thresh,
                         True).astype(r.dtype)
        if with_jac:
            return (r * keep[:, None], out[1] * keep[:, None, None]), slots
        return r * keep[:, None], slots

    def _eval_slots(self, g: _Group, slots, x: jnp.ndarray, p0s,
                    with_jac: bool):
        arity = slots.shape[1]
        tdofs, mans = g.tdofs, g.arg_manifolds
        xblocks = self._x_blocks(x)
        # per-arg one-hot row selectors (F, bucket_t): matmul-form gathers
        # (data-dependent index gathers compile pathologically on TPU)
        bases = []
        xlocs = []
        for k in range(arity):
            t = g.arg_types[k]
            nb = self.type_groups[t][2]
            O = jax.nn.one_hot(slots[:, k], nb,
                               dtype=g.meas.dtype)       # (F, nb)
            bases.append(O @ p0s[t])                     # (F, pdim_t)
            xlocs.append(O @ xblocks[t])                 # (F, dof_t)
        xloc = jnp.concatenate(xlocs, axis=-1)           # (F, local_dof)
        base = bases

        def local_points(base_f, xl):
            pts, o = [], 0
            for k in range(arity):
                pts.append(mans[k].exp(base_f[k], xl[o:o + tdofs[k]]))
                o += tdofs[k]
            return pts

        if g.mix is None:
            def res_one(model, meas, sqi, xl, *base_f):
                def res(xl_):
                    return sqi @ model.residual(meas,
                                                *local_points(base_f, xl_))
                if with_jac:
                    return res(xl), jax.jacfwd(res)(xl)
                return res(xl)

            return jax.vmap(res_one)(g.models, g.meas, g.sqrt_inv, xloc,
                                     *base)

        w, mus, sqis = g.mix

        def res_mix(model, xl, wrow, murow, sqirow, *base_f):
            def res(xl_):
                args = local_points(base_f, xl_)

                def comp(mu_k, sqi_k):
                    return sqi_k @ model.residual(mu_k, *args)

                rs = jax.vmap(comp)(murow, sqirow)        # (C, z)
                score = 0.5 * jnp.sum(rs * rs, axis=-1) - jnp.log(
                    jnp.maximum(wrow, 1e-30))
                return rs[jnp.argmin(score)]

            if with_jac:
                return res(xl), jax.jacfwd(res)(xl)
            return res(xl)

        return jax.vmap(res_mix)(g.models, xloc, w, mus, sqis, *base)

    # -- stacked whitened residual ---------------------------------------
    def residuals(self, x: jnp.ndarray, p0s=None) -> jnp.ndarray:
        p0s = self._p0_stacked() if p0s is None else p0s
        outs = [self._group_res(g, x, p0s, with_jac=False)[0].reshape(-1)
                for g in self.groups]
        return jnp.concatenate(outs) if outs else jnp.zeros((0,))

    def res_jac(self, x: jnp.ndarray, p0s=None):
        """Full (r, J) from per-group local jacobians.

        Rows are contiguous per group (plain concatenation); columns place
        per manifold-type block via narrow one-hot matmuls — TPU-friendly
        MXU work instead of scatter ops (XLA scatter compiles
        pathologically slowly on TPU)."""
        if p0s is None:
            p0s = self._p0_stacked()
        D = self.total_dof
        rs, Js = [], []
        for g in self.groups:
            (r, J), slots = self._group_res(g, x, p0s, with_jac=True)
            F, z = r.shape
            # split local columns per argument and place into type blocks
            blocks = [None] * len(self.type_groups)
            o = 0
            for k in range(len(g.tdofs)):
                dof = g.tdofs[k]
                t = g.arg_types[k]
                nb = self.type_groups[t][2]
                Jk = J[:, :, o:o + dof]                   # (F, z, dof)
                # XLA CSEs this against the identical one-hot inside
                # _group_res, so no duplicate work materializes
                O = jax.nn.one_hot(slots[:, k], nb,
                                   dtype=J.dtype)         # (F, nb)
                Bk = jnp.einsum("fzd,fv->fzvd", Jk, O)    # (F, z, nb, dof)
                Bk = Bk.reshape(F, z, nb * dof)
                blocks[t] = Bk if blocks[t] is None else blocks[t] + Bk
                o += dof
            cols = []
            for t, (man, _, nb, _) in enumerate(self.type_groups):
                w = nb * man.dof
                cols.append(blocks[t] if blocks[t] is not None
                            else jnp.zeros((F, z, w), J.dtype))
            Jg = jnp.concatenate(cols, axis=-1)           # (F, z, D)
            rs.append(r.reshape(-1))
            Js.append(Jg.reshape(-1, D))
        if not rs:
            return jnp.zeros((0,)), jnp.zeros((0, D))
        return jnp.concatenate(rs), jnp.concatenate(Js)

    # -- LM solve ---------------------------------------------------------
    def solve(self, x0: Optional[jnp.ndarray] = None, max_iters: int = 50,
              relinearize: int = 2, lam0: float = 1e-4,
              tol: float = 1e-8, compute_cov: bool = True,
              solver: str = "dense"):
        """Retract-and-relinearize rounds around one fully jitted step.

        The problem itself is a registered pytree whose static aux is only
        the bucket layout, so the jitted step/cov functions are shared
        across all problems with matching buckets — per-clique sweeps,
        autoinit, and growing graphs reuse one compilation.

        ``solver``: "dense" assembles H = JᵀJ explicitly (the measured
        default — fine to D well beyond the reference's scales, BASELINE
        round-5 "Parametric at scale"); "cg" is the matrix-free path for
        very large D: LM steps solve (JᵀJ + λI)x = Jᵀr by conjugate
        gradients on jvp/vjp products, never materializing J or H (the
        role of the reference's sparse-Jacobian machinery,
        ParametricManopt.jl:153-231)."""
        x = jnp.zeros((self.total_dof,)) if x0 is None else x0
        # one jitted dispatch for the type-bucket stacking (the eager
        # _p0_stacked route costs ~vars eager dispatches per solve)
        p0_layout, men, nbs = self._p0_layout()
        p0s = _p0_stack_single(p0_layout, men, nbs)(tuple(self.p0))

        cost = jnp.inf
        for _ in range(max(relinearize, 1)):
            p0s, cost = _solve_step(self, x, p0s, max_iters=max_iters,
                                    lam0=lam0, tol=tol, solver=solver)
            x = jnp.zeros_like(x)

        # write back linearization points (un-pad per type block as ONE
        # jitted dispatch — per-variable eager rows cost a tunnel dispatch
        # each)
        self.p0 = list(_single_unstack(self._real_layout())(p0s))
        cov = _cov_step(self, p0s) if compute_cov else None
        # cost stays a device scalar: float() here would force a host sync
        # per solve (expensive over a tunneled TPU; autoinit never reads it)
        return list(self.p0), cov, cost


# ---------------------------------------------------------------------------
# pytree registration: problems with identical bucket layout (same group
# treedefs/manifolds/bucketed shapes) share jit compilations of the solver
# steps below; exact sizes, index contents, and frozen sets are traced
# ---------------------------------------------------------------------------

def _group_flatten(g: _Group):
    hyp_ch = None if g.hyp is None else (g.hyp[0], g.hyp[1])
    hyp_aux = None if g.hyp is None else g.hyp[2]   # upos is static
    return ((g.models, g.meas, g.sqrt_inv, g.mix, g.var_slots, hyp_ch,
             g.null_p),
            (g.tdofs, g.arg_manifolds, g.arg_types, g.row_base, hyp_aux))


def _group_unflatten(aux, ch):
    g = object.__new__(_Group)
    (g.models, g.meas, g.sqrt_inv, g.mix, g.var_slots, hyp_ch,
     g.null_p) = ch
    g.tdofs, g.arg_manifolds, g.arg_types, g.row_base, hyp_aux = aux
    g.hyp = None if hyp_ch is None else (hyp_ch[0], hyp_ch[1], hyp_aux)
    return g


jax.tree_util.register_pytree_node(_Group, _group_flatten, _group_unflatten)


def _prob_flatten(p: "ParametricProblem"):
    children = (p.groups, p.free_mask)
    aux = (tuple((man, nb, tbase) for man, _, nb, tbase in p.type_groups),
           p.total_dof)
    return children, aux


def _prob_unflatten(aux, ch):
    p = object.__new__(ParametricProblem)
    p.groups, p.free_mask = ch
    tg, total_dof = aux
    # real counts are traced-irrelevant inside jit; use bucket as count
    p.type_groups = [(man, nb, nb, tbase) for man, nb, tbase in tg]
    p.total_dof = total_dof
    # host-only fields are absent inside traced code
    p.fg = None
    p.var_labels = None
    p.slot = None
    p.solve_key = None
    p.manifolds = None
    p.dofs = None
    p.offsets = None
    p.p0 = None
    return p


jax.tree_util.register_pytree_node(ParametricProblem, _prob_flatten,
                                   _prob_unflatten)


def _solve_step_impl(prob: "ParametricProblem", x: jnp.ndarray, p0s,
                     max_iters: int, lam0: float, tol: float,
                     solver: str = "dense"):
    core = _lm_core_cg if solver == "cg" else _lm_core
    x, cost = core(prob, x, p0s, max_iters, lam0, tol)
    return prob._retract_stacked(x, p0s), cost


@functools.partial(jax.jit, static_argnames=("max_iters", "lam0", "tol",
                                             "solver"))
def _solve_step(prob: "ParametricProblem", x: jnp.ndarray, p0s,
                max_iters: int = 50, lam0: float = 1e-4, tol: float = 1e-8,
                solver: str = "dense"):
    return _solve_step_impl(prob, x, p0s, max_iters, lam0, tol, solver)


@functools.partial(jax.jit, static_argnames=("max_iters", "lam0", "tol",
                                             "relinearize", "compute_cov"))
def _solve_batched(probs: "ParametricProblem", xs, p0ss,
                   max_iters: int = 50, relinearize: int = 2,
                   lam0: float = 1e-4, tol: float = 1e-8,
                   compute_cov: bool = True):
    """Full vmapped LM solve (all relinearize rounds + optional covariance,
    ONE dispatch) over B structurally-identical problems — the TPU
    replacement for the reference's task-per-clique parametric CSM solves
    (ParametricCSMFunctions.jl): same-level cliques (or same-round autoinit
    conditionals) execute as a single batched kernel."""

    def one(pr, x, p0):
        cost = jnp.inf
        for _ in range(max(relinearize, 1)):
            p0, cost = _solve_step_impl(pr, x, p0, max_iters, lam0, tol)
            x = jnp.zeros_like(x)
        if compute_cov:
            return p0, cost, _cov_impl(pr, p0)
        return p0, cost

    return jax.vmap(one)(probs, xs, p0ss)


def solve_problems_batched(probs: Sequence["ParametricProblem"],
                           max_iters: int = 50, relinearize: int = 2,
                           lam0: float = 1e-4, tol: float = 1e-8,
                           compute_cov: bool = True, mesh=None):
    """Solve many problems, batching structurally-identical ones into one
    vmapped kernel dispatch (bucketed shapes make identical structure the
    common case).  Returns ``[(points, cov_or_None, cost), …]`` aligned
    with ``probs``; each problem's ``p0`` is updated in place exactly as
    ``ParametricProblem.solve`` would.

    With ``mesh`` (jax.sharding.Mesh), the batch axis shards across the
    devices — the TPU-native form of the reference's WorkerPool clique
    distribution (SolveTree.jl:4-19): each device solves its slice of the
    batched problems, no communication needed until the host gathers."""
    from jax import tree_util

    results: List = [None] * len(probs)
    sig_groups: Dict = {}
    flat_of: List = [None] * len(probs)
    for i, p in enumerate(probs):
        leaves, treedef = tree_util.tree_flatten(p)
        # the real-variable layout is part of the key: treedef/shapes only
        # see PADDED buckets, so e.g. a 3-real-var and a 4-real-var clique
        # with equal buckets would otherwise merge and be assembled from
        # the representative's layout (IndexError on the input prep, or a
        # wrong-length p0 on the write-back)
        sig = (treedef, tuple((jnp.shape(l), jnp.result_type(l))
                              for l in leaves), p._real_layout())
        flat_of[i] = leaves
        sig_groups.setdefault(sig, []).append(i)

    for sig, idxs in sig_groups.items():
        batch = [probs[i] for i in idxs]
        if len(batch) == 1 and mesh is None:
            p = batch[0]
            results[idxs[0]] = p.solve(max_iters=max_iters,
                                       relinearize=relinearize, lam0=lam0,
                                       tol=tol, compute_cov=compute_cov)
            continue
        # pad the batch axis to a bucket (duplicates of the first problem;
        # rows are discarded) so the vmapped kernel compiles per B-bucket,
        # not per exact batch size; under a mesh also pad to a device
        # multiple so the leading axis shards evenly
        B = _bucket(len(batch))
        if mesh is not None:
            per = mesh.devices.size
            if B % per:
                # buckets are {1,1.5}·2^k — for device counts with other
                # prime factors fall back to the plain ceiling multiple
                B = -(-B // per) * per
        pad_idx = idxs + [idxs[0]] * (B - len(idxs))
        # ONE jitted dispatch stacks every problem leaf across the batch,
        # builds the per-type p0 buckets, and zero-inits x (the eager
        # tree_map(jnp.stack)/_p0_stacked route cost ~(leaves+vars)×B
        # eager expand_dims/concat dispatches per group — profiled as the
        # dominant host bucket of the warm parametric sweep)
        rep = batch[0]
        p0_layout, men, nbs = rep._p0_layout()
        prep = _batch_prep(sig[0], B, p0_layout, men, nbs, rep.total_dof)
        stacked_leaves, p0ss, xs = prep(
            tuple(tuple(flat_of[i]) for i in pad_idx),
            tuple(tuple(probs[i].p0) for i in pad_idx))
        stacked = tree_util.tree_unflatten(sig[0], stacked_leaves)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            axis = mesh.axis_names[0]

            def shard_leading(x):
                spec = PartitionSpec(axis, *([None] * (jnp.ndim(x) - 1)))
                return jax.device_put(x, NamedSharding(mesh, spec))

            stacked = tree_util.tree_map(shard_leading, stacked)
            xs = shard_leading(xs)
            p0ss = tree_util.tree_map(shard_leading, p0ss)
        out = _solve_batched(stacked, xs, p0ss, max_iters=max_iters,
                             relinearize=relinearize, lam0=lam0, tol=tol,
                             compute_cov=compute_cov)
        p0s_b, cost_b = out[0], out[1]
        cov_b = out[2] if compute_cov else None
        # results stay ON DEVICE: per-problem rows are produced by ONE
        # jitted unstack dispatch per group (each row as its own output
        # buffer), and every downstream consumer (write-back, message
        # covariance selection, the next autoinit round's stacking) is
        # itself a device op — the sweep runs with ZERO blocking
        # device->host transfers and no per-row eager slicing (profiled:
        # ~4 eager dispatches per problem on the fresh-graph sweep).
        # (A bulk device_get here once looked faster than lazy per-slice
        # reads, but any blocking transfer over the tunneled TPU can stall
        # seconds to minutes; keeping the pipeline transfer-free is both
        # faster and immune to that.)
        nb = len(idxs)
        # the group key includes the real layout, so one static unstack
        # plan is exact for every member
        tk = probs[idxs[0]]._real_layout()
        unst = _group_unstack(tk, nb, cov_b is not None)
        if cov_b is not None:
            per = unst(tuple(p0s_b), cov_b, cost_b)
        else:
            per = unst(tuple(p0s_b), cost_b, cost_b)
        for bi, i in enumerate(idxs):
            p = probs[i]
            p0_rows, cov_i, cost_i = per[bi]
            p.p0 = list(p0_rows)
            results[i] = (list(p0_rows),
                          (cov_i if cov_b is not None else None), cost_i)
    return results


@functools.lru_cache(maxsize=512)
def _p0_stack_single(p0_layout: tuple, men: tuple, nbs: tuple):
    """Single-problem form of the ``_batch_prep`` p0 bucketing: one jitted
    dispatch builds all per-type linearization buckets."""

    @jax.jit
    def fn(p0_rows):
        out = []
        for t, (man, nb) in enumerate(zip(men, nbs)):
            rows = [jnp.asarray(p0_rows[s]) for s in p0_layout[t]]
            rows = rows + [man.identity()] * (nb - len(rows))
            out.append(jnp.stack(rows))
        return tuple(out)

    return fn


@functools.lru_cache(maxsize=512)
def _single_unstack(tk: tuple):
    """Un-pad a solved problem's per-type p0 buckets back to per-variable
    rows as ONE jitted dispatch (each row its own output buffer)."""

    @jax.jit
    def fn(p0s):
        return tuple(p0s[t][k] for t, k in tk)

    return fn


@functools.lru_cache(maxsize=512)
def _batch_prep(treedef, batch: int, p0_layout: tuple, men: tuple,
                nbs: tuple, total_dof: int):
    """One jitted dispatch that assembles a structure group's batched solve
    inputs: per-leaf batch stacks, per-manifold-type p0 buckets (identity
    rows pad each bucket, lowered as constants), and the zero tangent
    state.  Replaces the eager tree_map(jnp.stack)/per-problem
    ``_p0_stacked`` route, whose ~(leaves+vars)×B eager dispatches through
    the tunnel dominated the warm parametric sweep's host time."""

    @jax.jit
    def fn(leaves_all, p0_all):
        n_leaves = len(leaves_all[0])
        stacked = tuple(
            jnp.stack([jnp.asarray(leaves_all[b][j]) for b in range(batch)])
            for j in range(n_leaves))
        p0ss = []
        for t, (man, nb) in enumerate(zip(men, nbs)):
            ident = man.identity()
            rows_b = []
            for b in range(batch):
                rows = [jnp.asarray(p0_all[b][s]) for s in p0_layout[t]]
                rows = rows + [ident] * (nb - len(rows))
                rows_b.append(jnp.stack(rows))
            p0ss.append(jnp.stack(rows_b))
        xs = jnp.zeros((batch, total_dof))
        return stacked, tuple(p0ss), xs

    return fn


@functools.lru_cache(maxsize=512)
def _group_unstack(tk: tuple, batch: int, with_cov: bool):
    """One jitted dispatch that splits a group's batched solve outputs into
    per-problem per-variable row buffers (replaces ~(vars+2) x batch eager
    slice dispatches through the tunnel — profiled as the top host bucket
    of the fresh-graph parametric sweep)."""

    @jax.jit
    def fn(p0s_b, cov_b, cost_b):
        per = []
        for bi in range(batch):
            p0_rows = tuple(p0s_b[t][bi, k] for t, k in tk)
            per.append((p0_rows, cov_b[bi] if with_cov else cost_b[bi],
                        cost_b[bi]))
        return tuple(per)

    return fn


def _cov_impl(prob: "ParametricProblem", p0s):
    zero = jnp.zeros((prob.total_dof,))
    _, J = prob.res_jac(zero, p0s)
    m = prob.free_mask
    Jf = J * m[None, :]
    H = Jf.T @ Jf + jnp.diag(1.0 - m)
    cov = jnp.linalg.inv(H + 1e-8 * jnp.eye(H.shape[0]))
    # frozen/padded rows and columns report zero covariance
    return cov * (m[:, None] * m[None, :])


_cov_step = jax.jit(_cov_impl)


def _lm_core(prob: ParametricProblem, x0: jnp.ndarray, p0s,
             max_iters: int, lam0: float, tol: float):
    """Damped GN/LM with multiplicative damping adaptation (the reference's
    Manopt.LevenbergMarquardt! role, ParametricManopt.jl:307-377).

    Frozen and padded coordinates enter as the traced mask m:
    ``H' = mmᵀ⊙H + diag(1-m), g' = m⊙g`` — frozen rows decouple to the
    identity with zero gradient, so the step solves exactly the reduced
    free-block system while the compiled program stays mask-independent."""

    m = prob.free_mask

    def cost(x):
        r = prob.residuals(x, p0s)
        return 0.5 * jnp.sum(r * r)

    def body(carry):
        x, lam, c, it, done = carry
        r, J = prob.res_jac(x, p0s)
        g = m * (J.T @ r)
        H = (m[:, None] * m[None, :]) * (J.T @ J) + jnp.diag(1.0 - m)
        step = jnp.linalg.solve(
            H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-8)), g)
        x_new = x - step * m
        c_new = cost(x_new)
        improve = c_new < c
        x = jnp.where(improve, x_new, x)
        lam = jnp.where(improve, jnp.maximum(lam * 0.3, 1e-10), lam * 8.0)
        done = jnp.abs(c - c_new) < tol * jnp.maximum(c, 1.0)
        return (x, lam, jnp.where(improve, c_new, c), it + 1, done)

    def cond(carry):
        _, lam, _, it, done = carry
        return (it < max_iters) & (~done) & (lam < 1e8)

    x, _, c, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(lam0), cost(x0), 0, False))
    return x, c


def _lm_core_cg(prob: ParametricProblem, x0: jnp.ndarray, p0s,
                max_iters: int, lam0: float, tol: float,
                cg_iters: int = 200):
    """Matrix-free LM: each step solves (JᵀJ + λI)s = Jᵀr by conjugate
    gradients on jvp/vjp products of the stacked residual function —
    J and H are never materialized, so memory is O(D + residuals)
    instead of O(D²) (the role of the reference's sparse-coloring
    Jacobian, ParametricManopt.jl:153-231, :257-278; here the sparsity
    is exploited implicitly through the residual graph structure).

    Classic Levenberg damping (λI, not λ·diag(H): the Marquardt diagonal
    would itself cost a J materialization); frozen/padded coordinates
    decouple through the same mask algebra as the dense core."""

    m = prob.free_mask

    def residuals(x):
        return prob.residuals(x, p0s)

    def cost(x):
        r = residuals(x)
        return 0.5 * jnp.sum(r * r)

    def body(carry):
        x, lam, c, it, done = carry
        r, vjp = jax.vjp(residuals, x)
        g = m * vjp(r)[0]

        def Hmv(v):
            vm = m * v
            _, Jv = jax.jvp(residuals, (x,), (vm,))
            return m * vjp(Jv)[0] + (1.0 - m) * v + lam * v

        step, _ = jax.scipy.sparse.linalg.cg(Hmv, g, maxiter=cg_iters,
                                             tol=1e-12)
        x_new = x - step * m
        c_new = cost(x_new)
        improve = c_new < c
        x = jnp.where(improve, x_new, x)
        lam = jnp.where(improve, jnp.maximum(lam * 0.3, 1e-10), lam * 8.0)
        done = jnp.abs(c - c_new) < tol * jnp.maximum(c, 1.0)
        return (x, lam, jnp.where(improve, c_new, c), it + 1, done)

    def cond(carry):
        _, lam, _, it, done = carry
        return (it < max_iters) & (~done) & (lam < 1e8)

    x, _, c, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(lam0), cost(x0), 0, False))
    return x, c


# ---------------------------------------------------------------------------
# public API (reference solveGraphParametric!, solveConditionalsParametric)
# ---------------------------------------------------------------------------

def _write_back(fg: FactorGraph, prob: ParametricProblem, points, cov,
                labels: Optional[Sequence[str]] = None) -> Dict[str, dict]:
    out = {}
    labels = set(labels or prob.var_labels)
    for i, v in enumerate(prob.var_labels):
        if v not in labels:
            continue
        var = fg.var(v)
        var.parametric_point = points[i]
        if cov is not None:
            s = int(prob.offsets[i])
            e = s + prob.dofs[i]
            var.parametric_cov = cov[s:e, s:e]
        var.ppe["parametric"] = {"mean": points[i], "max": points[i],
                                 "suggested": points[i]}
        # report only this solve's covariance, never a stale earlier one
        out[v] = {"point": points[i],
                  "cov": var.parametric_cov if cov is not None else None}
    return out


def solve_graph_parametric(fg: FactorGraph, max_iters: int = 50,
                           relinearize: int = 2,
                           init_from_belief: bool = True,
                           solver: str = "dense",
                           compute_cov: bool = True) -> Dict[str, dict]:
    """Full-graph batch parametric solve (reference solveGraphParametric! =
    RLM entry, ParametricManopt.jl:588-613).

    ``solver="cg"``: matrix-free LM for very large graphs (no dense
    J/H materialization — see ParametricProblem.solve); pair with
    ``compute_cov=False`` since the covariance is itself dense (JᵀJ)⁻¹."""
    prob = ParametricProblem(fg)
    points, cov, cost = prob.solve(max_iters=max_iters,
                                   relinearize=relinearize,
                                   compute_cov=compute_cov,
                                   solver=solver)
    result = _write_back(fg, prob, points, cov)
    # lazy device scalar: float() here would force a device->host sync per
    # solve (over a tunneled TPU a blocking transfer costs seconds to
    # minutes); callers that want the number compare/float it themselves
    result["_cost"] = cost
    return result


def solve_conditionals_parametric(fg: FactorGraph,
                                  frontals: Sequence[str],
                                  separators: Sequence[str] = (),
                                  max_iters: int = 50,
                                  compute_cov: bool = True) -> Dict[str, dict]:
    """Solve ``frontals`` with ``separators`` pinned (reference
    solveConditionalsParametric, ParametricUtils.jl:655-721)."""
    labels = list(frontals) + [s for s in separators if s not in frontals]
    factors = [fl for fl in fg.lsf()
               if all(v in set(labels) for v in fg.factor(fl).variables)
               and any(v in set(frontals) for v in fg.factor(fl).variables)]
    prob = ParametricProblem(fg, variables=labels, factors=factors,
                             frozen=tuple(separators))
    points, cov, cost = prob.solve(max_iters=max_iters,
                                   compute_cov=compute_cov)
    result = _write_back(fg, prob, points, cov, labels=frontals)
    result["_cost"] = cost
    return result


def autoinit_parametric(fg: FactorGraph, max_iters: int = 50) -> None:
    """Initialize parametric points variable-by-variable in topological
    order from priors (reference autoinitParametric!,
    ParametricManopt.jl:497-580).

    All variables ready in the same round are independent given already-
    initialized neighbors, so their conditional solves batch into one
    vmapped kernel (solve_problems_batched) instead of one dispatch each."""
    pending = [v for v in fg.ls() if fg.var(v).parametric_point is None]
    guard = 0
    while pending and guard < len(fg.ls()) + 2:
        guard += 1
        round_probs, round_vars = [], []
        for v in pending:
            nbr_fs = fg.factors_of(v)
            usable = []
            for fl in nbr_fs:
                f = fg.factor(fl)
                if isinstance(f.model, (MetaPrior, GenericMarginal)):
                    continue
                others = [o for o in f.variables if o != v]
                if all(fg.var(o).parametric_point is not None
                       for o in others):
                    usable.append(fl)
            if not usable:
                continue
            seps = sorted({o for fl in usable
                           for o in fg.factor(fl).variables if o != v})
            if not any(len(fg.factor(fl).variables) == 1 for fl in usable) \
                    and not seps:
                continue
            labels = [v] + seps
            round_probs.append(ParametricProblem(
                fg, variables=labels, factors=usable, frozen=tuple(seps)))
            round_vars.append(v)
        if not round_vars:
            break
        res = solve_problems_batched(round_probs, max_iters=max_iters)
        for prob, v, (points, cov, _) in zip(round_probs, round_vars, res):
            _write_back(fg, prob, points, cov, labels=[v])
        done = set(round_vars)
        pending = [v for v in pending if v not in done]


def init_parametric_from(fg: FactorGraph, from_key: str = "default",
                         only_missing: bool = False) -> int:
    """Seed the parametric solution from another solve key's beliefs
    (reference initParametricFrom!, ParametricUtils.jl:866-889): each
    initialized variable gets ``parametric_point = on-manifold mean`` and
    ``parametric_cov`` from the particle cloud.  ``only_missing`` keeps
    already-set parametric points (the incremental case).  Returns the
    number of variables seeded."""
    from ..beliefs import mean_cov as _belief_mean_cov

    # group by (manifold, particle count) so each group seeds as ONE
    # vmapped dispatch instead of two eager ops per variable
    groups: Dict = {}
    for vl in fg.ls():
        v = fg.var(vl)
        if only_missing and v.parametric_point is not None:
            continue
        if not v.is_initialized(from_key):
            continue
        pts = v.beliefs[from_key].points
        groups.setdefault((v.manifold, pts.shape), []).append((v, pts))

    n = 0
    for (man, _), items in groups.items():
        if len(items) == 1:
            v, pts = items[0]
            v.parametric_point, v.parametric_cov = _belief_mean_cov(man, pts)
            n += 1
            continue
        rows = _seed_rows_fn(man, len(items))(
            tuple(pts for _, pts in items))
        for (v, _), (mu_i, cov_i) in zip(items, rows):
            v.parametric_point = mu_i
            v.parametric_cov = cov_i
            n += 1
    return n


@functools.lru_cache(maxsize=512)
def _seed_rows_fn(man, batch: int):
    """Stack + vmapped mean/cov + per-variable unstack as ONE jitted
    dispatch (the eager mus[i]/covs[i] slices were 2 tunnel dispatches
    per variable)."""
    from ..beliefs import mean_cov as _belief_mean_cov

    @jax.jit
    def fn(pts_tuple):
        stack = jnp.stack(pts_tuple)
        mus, covs = jax.vmap(lambda p: _belief_mean_cov(man, p))(stack)
        return tuple((mus[i], covs[i]) for i in range(batch))

    return fn
