"""Fused per-variable belief update — one XLA kernel per structure.

The MM-iSAM inner loop (reference doFMCIteration → propagateBelief →
proposalbeliefs! → evalFactor → manifoldProduct,
src/services/SolveTree.jl:47, GraphProductOperations.jl:16-78) updates one
variable by convolving every connected factor and multiplying the proposals.
Run as separate ops that is 30-50 device dispatches per update; at ~100 µs
TPU dispatch latency the host becomes the bottleneck (SURVEY.md §7 perf
note).  Here the *entire* update — all factor convolutions, LOO bandwidth
selections, the exact pairwise product cascade, and the output bandwidth —
traces into ONE jitted function, cached per (manifold, factor-structure,
shape) signature.  Sweeping a clique then costs one dispatch per variable
update instead of dozens.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..beliefs import loo_bandwidth
from ..manifolds import Manifold
from .convolve import ConvSpec, eval_factor_core
from .product import (CONDENSE_K, CONDENSE_MIN_NB, LARGE_PAIR_THRESHOLD,
                      condense_mixture, pair_product_tangent,
                      pair_product_tangent_large,
                      pair_product_tangent_weighted)

__all__ = ["fused_variable_update", "fused_variable_update_batched",
           "fused_clique_gibbs", "product_traceable"]


def product_traceable(manifold: Manifold, pts_list, bw_list,
                      static_masks: Tuple[Tuple[bool, ...], ...],
                      old_points: jnp.ndarray, key, n_out: int):
    """Traceable exact-cascade product (see ops/product.py) with *static*
    per-proposal dim masks so partial handling compiles away."""
    D = len(pts_list)
    if D == 1 and all(static_masks[0]):
        return pts_list[0][:n_out]

    pooled = jnp.concatenate(pts_list, axis=0)
    ref = manifold.mean(pooled)

    mus, precs = [], []
    for pts, bw, mask in zip(pts_list, bw_list, static_masks):
        t = manifold.log(ref[None, :], pts)
        m = jnp.asarray(mask)
        lam = jnp.where(m, 1.0 / jnp.maximum(bw**2, 1e-12), 0.0)
        mus.append(t)
        precs.append(jnp.broadcast_to(lam, t.shape))

    keys = jax.random.split(key, 2 * D + 1)
    mu, prec = mus[0], precs[0]
    if D == 1:
        # one-hot matmul, not a data-dependent gather (design rule,
        # CLAUDE.md; same form as ops/product.py's cascade) — gathers
        # lower pathologically on TPU inside the fused chain programs
        sel = jax.nn.one_hot(
            jax.random.randint(keys[0], (n_out,), 0, mu.shape[0]),
            mu.shape[0], dtype=mu.dtype)
        # HIGHEST: default MXU precision would bf16-round the selected
        # VALUES (the one-hot side is exact either way)
        mu = jnp.dot(sel, mu, precision=jax.lax.Precision.HIGHEST)
        prec = jnp.dot(sel, prec, precision=jax.lax.Precision.HIGHEST)
    for j in range(1, D):
        nb = mus[j].shape[0]
        if nb >= CONDENSE_MIN_NB and \
                mu.shape[0] * nb < LARGE_PAIR_THRESHOLD:
            # subquadratic path: condense the incoming density to a
            # weighted cluster mixture, stage cost O(N·k) (see
            # ops/product.py — VERDICT r3 item 3)
            cB, pB, lwB = condense_mixture(mus[j], precs[j], keys[D + j],
                                           k=min(CONDENSE_K, nb))
            mu, prec = pair_product_tangent_weighted(
                mu, prec, cB, pB, lwB, keys[j], n_out)
        elif mu.shape[0] * nb >= LARGE_PAIR_THRESHOLD:
            mu, prec = pair_product_tangent_large(
                mu, prec, mus[j], precs[j], keys[j], n_out,
                interpret=jax.default_backend() == "cpu")
        else:
            mu, prec = pair_product_tangent(mu, prec, mus[j], precs[j],
                                            keys[j], n_out)
    noise = jax.random.normal(keys[-1], mu.shape) / \
        jnp.sqrt(jnp.maximum(prec, 1e-30))
    samples = jnp.where(prec > 0, mu + noise, 0.0)

    # dims constrained by no proposal (static) keep the old belief's values
    any_mask = [any(m[d] for m in static_masks)
                for d in range(manifold.dof)]
    if not all(any_mask):
        old_t = manifold.log(ref[None, :], old_points[:n_out])
        keep = jnp.asarray(any_mask)
        samples = jnp.where(keep[None, :], samples, old_t)

    return manifold.project(
        manifold.exp(jnp.broadcast_to(ref, (n_out,) + ref.shape), samples))


def _make_update(manifold: Manifold, specs: Tuple[ConvSpec, ...],
                 masks: Tuple[Tuple[bool, ...], ...], n_out: int):
    def update(models, var_points_nested, old_points, key):
        F = len(specs)
        keys = jax.random.split(key, F + 1)
        # Same-structure factor convolutions execute as ONE vmapped
        # evaluation over a leading factor axis (round-5: the serial
        # small-op floor of the fused chain was the per-factor chains of
        # tiny VPU ops — a clique variable with G same-shape
        # LinearRelatives now costs one G-wide program instead of G
        # sequential ones).  Each factor keeps exactly its original
        # keys[i], so the sample streams — and therefore the solve — are
        # unchanged.  Grouping is trace-time-static: spec + model tree
        # structure/leaf shapes + input point shapes.
        groups: dict = {}
        for i in range(F):
            leaves, tdef = jax.tree.flatten(models[i])
            gk = (specs[i], tdef,
                  tuple((jnp.shape(l), jnp.result_type(l)) for l in leaves),
                  tuple(jnp.shape(a) for a in var_points_nested[i]))
            groups.setdefault(gk, []).append(i)

        pts_list = [None] * F
        for (spec, _tdef, _ls, _ns), idxs in groups.items():
            if len(idxs) == 1:
                i = idxs[0]
                pts_list[i] = eval_factor_core(
                    manifold, models[i], keys[i], var_points_nested[i],
                    spec)
                continue
            ms = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[models[i] for i in idxs])
            ns = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[var_points_nested[i] for i in idxs])
            ks = jnp.stack([keys[i] for i in idxs])

            def _one(m, n, k, _spec=spec):
                return eval_factor_core(manifold, m, k, n, _spec)

            ps = jax.vmap(_one)(ms, ns, ks)
            for j, i in enumerate(idxs):
                pts_list[i] = ps[j]

        if F == 1 and all(masks[0]):
            # product_traceable's single-density full-mask fast path never
            # reads the proposal bandwidth — skip its LOO selection (~10
            # fusion regions, see the region cost model above)
            bw_list = [jnp.ones((manifold.dof,), pts_list[0].dtype)]
        elif len({p.shape for p in pts_list}) == 1:
            # ONE vmapped LOO selection for every proposal (they share the
            # target variable's shape) instead of F separate ~10-region
            # selections; per-row results are identical to the per-factor
            # calls
            stacked = jnp.stack(pts_list)
            bws = jax.vmap(lambda p: loo_bandwidth(manifold, p))(stacked)
            bw_list = [bws[i] for i in range(F)]
        else:
            # mixed per-variable particle counts tile proposals to
            # different lengths — fall back to per-factor selection
            bw_list = [loo_bandwidth(manifold, p) for p in pts_list]
        out = product_traceable(manifold, pts_list, bw_list, masks,
                                old_points, keys[-1], n_out)
        return out, loo_bandwidth(manifold, out)

    return update


@functools.lru_cache(maxsize=1024)
def _fused_fn(manifold: Manifold, specs: Tuple[ConvSpec, ...],
              masks: Tuple[Tuple[bool, ...], ...], n_out: int):
    return jax.jit(_make_update(manifold, specs, masks, n_out))


@functools.lru_cache(maxsize=1024)
def _fused_fn_batched(manifold: Manifold, specs: Tuple[ConvSpec, ...],
                      masks: Tuple[Tuple[bool, ...], ...], n_out: int):
    """vmap of the fused update over a leading instance axis — same-
    structure variable updates across same-level cliques execute as ONE
    kernel (the per-level batched clique solve of SURVEY.md §7.6)."""
    return jax.jit(jax.vmap(_make_update(manifold, specs, masks, n_out)))


def fused_variable_update_batched(plans, keys):
    """Execute same-structure UpdatePlans as one vmapped kernel.

    plans: list of ops.graphops.UpdatePlan sharing ``structure_key``;
    keys: one PRNG key per plan.  Returns (points (B, n, pd), bw (B, dof)).
    """
    p0 = plans[0]
    fn = _fused_fn_batched(p0.manifold, p0.specs, p0.masks, p0.n_out)
    models = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[p.models for p in plans])
    nested = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[p.nested for p in plans])
    old = jnp.stack([p.old_points for p in plans])
    return fn(models, nested, old, jnp.stack(keys))


def fused_variable_update(manifold: Manifold,
                          models: Sequence,
                          var_points_nested: Sequence[Tuple[jnp.ndarray, ...]],
                          old_points: jnp.ndarray,
                          specs: Sequence[ConvSpec],
                          masks: Sequence[Tuple[bool, ...]],
                          key, n_out: int):
    """One-dispatch variable update: returns (points, bw)."""
    fn = _fused_fn(manifold, tuple(specs), tuple(masks), n_out)
    return fn(tuple(models), tuple(tuple(v) for v in var_points_nested),
              old_points, key)


def _make_clique_chain(direct_steps: Tuple, iter_steps: Tuple,
                       n_rounds: int):
    """Un-jitted whole-clique Gibbs body — reused by the per-clique jit
    (:func:`_fused_chain_fn`) and by the multi-clique segment fusion
    (:func:`fused_up_segment`)."""
    iter_touched = tuple(step[0] for step in iter_steps)

    def _apply(step, models, store, key):
        li, manifold, specs, masks, n_out, fvidx = step
        nested = tuple(tuple(store[j] for j in idxs) for idxs in fvidx)
        update = _make_update(manifold, specs, masks, n_out)
        pts, bw = update(models, nested, store[li], key)
        return store[:li] + (pts,) + store[li + 1:], bw

    def _round(models_iter, store, key):
        keys = jax.random.split(key, max(1, len(iter_steps)))
        bws = {}
        for s, step in enumerate(iter_steps):
            store, bw = _apply(step, models_iter[s], store, keys[s])
            bws[step[0]] = bw
        return store, tuple(bws[li] for li in iter_touched)

    def chain_body(models_direct, models_iter, store, key):
        kd, ki0, kr = jax.random.split(key, 3)
        store = tuple(store)
        dbws = []
        keys = jax.random.split(kd, max(1, len(direct_steps)))
        for s, step in enumerate(direct_steps):
            store, bw = _apply(step, models_direct[s], store, keys[s])
            dbws.append(bw)
        ibws = ()
        if iter_steps:
            # ALL rounds ride the scan (the first round used to be traced
            # inline just to seed the carry; zero-init bandwidths of the
            # known (dof,) shapes seed it instead — halves the iter part
            # of the HLO, which dominated the cold-compile wall).  Key
            # sequence matches the old unrolled-first-round layout exactly.
            dt = store[0].dtype
            ibws0 = tuple(jnp.zeros((step[1].dof,), dt)
                          for step in iter_steps)

            def body(carry, k):
                st, _ = carry
                st, bws = _round(models_iter, st, k)
                return (st, bws), None

            ks = jnp.concatenate([ki0[None],
                                  jax.random.split(kr, n_rounds - 1)]) \
                if n_rounds > 1 else ki0[None]
            (store, ibws), _ = jax.lax.scan(body, (store, ibws0), ks)
        return store, tuple(dbws), ibws

    return chain_body


@functools.lru_cache(maxsize=64)
def _fused_segment_fn(seg_static: Tuple, n_rounds: int):
    """One jitted dispatch for a CHAIN of cliques (a run of single-clique
    tree levels): each clique's Gibbs chain is traced in sequence, with the
    inter-clique up-message — a MsgPrior over the child's solved separator
    belief — substituted IN-TRACE from the child's output store instead of
    round-tripping through the host (the static-schedule replacement for
    the reference's channel rendezvous, SolverAPI.jl:59-97, now without a
    device dispatch per clique).

    seg_static: per clique
      (direct_steps, iter_steps, msg_subs) where msg_subs is a tuple of
      (which, step_idx, factor_idx, child_slot, manifold) marking plan
      positions whose MsgPrior model must be rebuilt from the previous
      clique's output (points=store[child_slot], bw=that slot's bw or a
      fresh LOO bandwidth when the child did not update it)."""
    from ..beliefs import Belief
    from ..models.factors import MsgPrior

    def segment(models_d_all, models_i_all, stores, keys):
        prev_store = None
        prev_bw: dict = {}
        outs = []
        for ci, (dsteps, isteps, msg_subs) in enumerate(seg_static):
            models_d = [list(m) for m in models_d_all[ci]]
            models_i = [list(m) for m in models_i_all[ci]]
            for which, si, fi, child_slot, manifold in msg_subs:
                pts = prev_store[child_slot]
                bw = prev_bw.get(child_slot)
                if bw is None:
                    bw = loo_bandwidth(manifold, pts)
                belief = Belief(points=pts, bw=bw,
                                ipc=jnp.ones((manifold.dof,), pts.dtype))
                mp = MsgPrior(belief, manifold)
                (models_d if which == 0 else models_i)[si][fi] = mp
            chain = _make_clique_chain(dsteps, isteps, n_rounds)
            store, dbws, ibws = chain(
                tuple(tuple(m) for m in models_d),
                tuple(tuple(m) for m in models_i),
                stores[ci], keys[ci])
            outs.append((store, dbws, ibws))
            prev_store = store
            prev_bw = {step[0]: bw for step, bw in zip(dsteps, dbws)}
            prev_bw.update({step[0]: bw
                            for step, bw in zip(isteps, ibws)})
        return tuple(outs)

    return jax.jit(segment)


def fused_up_segment(seg_static, n_rounds, models_d_all, models_i_all,
                     stores, keys):
    """Run a prepared chain-of-cliques up sweep as ONE dispatch (see
    scheduler ``up_solve_segment`` for the host-side assembler)."""
    fn = _fused_segment_fn(tuple(seg_static), int(n_rounds))
    return fn(tuple(models_d_all), tuple(models_i_all), tuple(stores),
              tuple(keys))


@functools.lru_cache(maxsize=512)
def _fused_chain_fn(direct_steps: Tuple, iter_steps: Tuple, n_rounds: int):
    """Whole-clique Gibbs schedule as ONE jitted dispatch.

    Steps are static per-update plans — tuples of
    (target_local_idx, manifold, specs, masks, n_out, factor_var_idx)
    where factor_var_idx maps each factor's variables into the clique-local
    points store.  The reference's fmcmc! outer loop
    (SolveTree.jl:89-142) costs one device dispatch per variable update;
    here direct vars run once, the first Gibbs round is traced inline, and
    the remaining ``n_rounds - 1`` rounds ride a lax.scan over the SAME
    round body (built by :func:`_make_clique_chain`) — so compile cost is
    ~2 rounds regardless of gibbsIters and runtime is a single XLA
    program, cached per clique-structure signature (isomorphic cliques —
    every chain/LineStep middle clique — share one compilation)."""
    body = _make_clique_chain(direct_steps, iter_steps, n_rounds)

    def clique_chain(models_direct, models_iter, store, key):
        # NOTE: distinctive function name — some environments cannot
        # serialize these scan-bearing XLA:CPU executables (see
        # tests/conftest.py history). TPU serialization is unaffected.
        return body(models_direct, models_iter, store, key)

    return jax.jit(clique_chain)


def fused_clique_gibbs(direct_steps, iter_steps, n_rounds,
                       models_direct, models_iter, store, key):
    """Run a prepared whole-clique Gibbs chain (see scheduler
    ``_gibbs_solve_chain`` for the host-side plan builder).  Returns
    (store, direct_bws aligned to direct_steps, iter_bws aligned to the
    iter-step target order)."""
    fn = _fused_chain_fn(tuple(direct_steps), tuple(iter_steps),
                         int(n_rounds))
    return fn(tuple(models_direct), tuple(models_iter), tuple(store), key)
