"""Parametric tree solve — clique-wise Gaussian message passing.

Reference: src/parametric/services/ParametricCSMFunctions.jl
(solveUp_ParametricStateMachine :8-97, solveDown_ParametricStateMachine
:105-194) + calculateCoBeliefMessage (ParametricUtils.jl:744-796): the up
message is the clique's joint Gaussian marginal over its separator
variables; the down solve pins separators and re-solves frontals.  Runs on
the same level-synchronous schedule as the nonparametric sweeps.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import FactorGraph
from ..models.factors import GaussianJoint
from ..parallel.scheduler import build_clique_subgraph
from ..tree.bayestree import BayesTree, CliqStatus, build_tree_reset
from .solver import (ParametricProblem, autoinit_parametric,
                     init_parametric_from)

__all__ = ["solve_tree_parametric", "GaussianMessage"]


class GaussianMessage:
    """Parametric inter-clique message: joint Gaussian over separator vars."""

    def __init__(self, sender: int, variables: List[str], points, cov):
        self.sender = sender
        self.variables = list(variables)
        self.points = list(points)
        self.cov = cov


@functools.lru_cache(maxsize=2048)
def _select_cov_fn(sel: tuple, n: int):
    S = np.zeros((len(sel), n), np.float32)
    S[np.arange(len(sel)), list(sel)] = 1.0
    Sj = jnp.asarray(S)
    return jax.jit(lambda cov: Sj @ jnp.asarray(cov, jnp.float32) @ Sj.T)


def _select_cov(cov, sel: np.ndarray):
    """Principal submatrix ``cov[ix_(sel, sel)]`` as ONE jitted device op:
    the selection matrix is a host-numpy constant (lowers as a literal),
    so the whole parametric sweep stays free of blocking device->host
    transfers (a tunnel transfer can stall seconds to minutes) and of
    data-dependent gathers (pathological on TPU — design rule, CLAUDE.md);
    jitting (cached per selection signature) collapses what were two
    EAGER matmul dispatches per message into one call."""
    return _select_cov_fn(tuple(int(i) for i in sel),
                          int(jnp.shape(cov)[0]))(cov)


@functools.lru_cache(maxsize=2048)
def _finalize_fn(offsets: tuple, dofs: tuple):
    n = len(dofs)

    @jax.jit
    def fn(points, cov):
        pts = tuple(points[i] for i in range(n))
        covs = tuple(cov[offsets[i]:offsets[i] + dofs[i],
                         offsets[i]:offsets[i] + dofs[i]]
                     for i in range(n))
        return pts, covs

    return fn


def _attach_message(sub: FactorGraph, msg: GaussianMessage, tag: str) -> None:
    """Insert a Gaussian message as a joint prior factor on the subgraph
    (the parametric analogue of addMsgFactors!)."""
    if not msg.variables:
        return
    keep = [i for i, v in enumerate(msg.variables) if v in sub.variables]
    if not keep:
        return
    manifolds_all = [sub.var(v).manifold for v in msg.variables
                     if v in sub.variables]
    dofs = []
    for v in msg.variables:
        # message covariance is ordered by msg.variables' tangent dofs
        # (shape metadata only — np.asarray here would TRANSFER the array)
        dofs.append(sub.var(v).manifold.dof if v in sub.variables
                    else int(jnp.shape(msg.points[
                        msg.variables.index(v)])[-1]))
    starts = np.concatenate([[0], np.cumsum(dofs)]).astype(int)
    sel = np.concatenate([np.arange(starts[i], starts[i + 1])
                          for i in keep])
    cov = _select_cov(msg.cov, sel)
    vars_here = [msg.variables[i] for i in keep]
    p0s = [msg.points[i] for i in keep]
    sub.add_factor(vars_here, GaussianJoint(manifolds_all, p0s, cov),
                   label=f"__PARAMMSG_{tag}_{msg.sender}", graphinit=False)


def _finalize_clique(prob: ParametricProblem, sub: FactorGraph,
                     points, cov) -> ParametricProblem:
    # one jitted dispatch for all per-variable point rows + cov blocks
    # (eager points[i] / cov[s:e, s:e] slicing cost ~3 tunnel dispatches
    # per variable per clique — the top host bucket of the parametric
    # fresh-graph sweep)
    nv = len(prob.var_labels)
    offs = tuple(int(prob.offsets[i]) for i in range(nv))
    dofs = tuple(int(prob.dofs[i]) for i in range(nv))
    pts, covs = _finalize_fn(offs, dofs)(points, cov)
    for i, v in enumerate(prob.var_labels):
        sv = sub.var(v)
        sv.parametric_point = pts[i]
        sv.parametric_cov = covs[i]
    prob.full_cov = cov
    return prob


def _marginal_message(prob: ParametricProblem, sub: FactorGraph, clique
                      ) -> GaussianMessage:
    seps = clique.separator
    sel = np.concatenate([
        np.arange(int(prob.offsets[prob.slot[v]]),
                  int(prob.offsets[prob.slot[v]]) + prob.dofs[prob.slot[v]])
        for v in seps]).astype(int) if seps else np.zeros((0,), int)
    cov = _select_cov(prob.full_cov, sel)
    pts = [sub.var(v).parametric_point for v in seps]
    return GaussianMessage(clique.cid, seps, pts, cov)


def solve_tree_parametric(fg: FactorGraph,
                          old_tree: Optional[BayesTree] = None,
                          order=None, mesh=None) -> BayesTree:
    """Clique-wise parametric solve over the Bayes tree (reference
    solveTree!(…; algorithm=:parametric), SolverAPI.jl:423 routing into the
    parametric CSM states).

    ``mesh``: shard each level's batched clique solves across the device
    mesh (the reference's WorkerPool remotecall distribution,
    CliqStateMachineUtils.jl:349-410, as a sharded batch axis)."""
    # ensure linearization points exist everywhere: seed from existing
    # nonparametric beliefs first (reference initParametricFrom!,
    # ParametricUtils.jl:866-889 — cheaper and better-informed than
    # conditional autoinit), then autoinit whatever remains
    if any(fg.var(v).parametric_point is None for v in fg.ls()):
        init_parametric_from(fg, only_missing=True)
    if any(fg.var(v).parametric_point is None for v in fg.ls()):
        autoinit_parametric(fg)

    tree = build_tree_reset(fg, order=order, old_tree=old_tree)
    levels = tree.levels()
    up_msgs: Dict[int, GaussianMessage] = {}

    # ---- up-message recycling (the parametric analogue of the reference's
    # UPRECYCLED skip): a clique whose WHOLE subtree matched the previous
    # tree (build_tree_reset's subtree-consistency pass) re-sends its
    # previous Gaussian up message instead of re-running the LM.  Keyed by
    # clique signature so ids may differ across rebuilds.  The "inputs are
    # provably identical" claim is STRUCTURAL: it relies on the factor-
    # model immutability contract (parametric/solver.py _GROUP_CACHE note)
    # — an in-place edit of a factor's measurement without a label change
    # would make this recycled message stale, exactly as it would in the
    # reference (attemptTreeSimilarClique matches labels, not values).
    old_msgs: Dict = (getattr(old_tree, "param_up_msgs", {})
                      if old_tree is not None else {})
    tree.param_up_msgs = {}

    # ---- up sweep: same-level cliques batch into one vmapped LM kernel
    # (solve_problems_batched; the reference runs one async Task per clique
    # instead, ParametricCSMFunctions.jl:8-97) ----
    from .solver import solve_problems_batched

    for level in reversed(levels):
        entries = []
        for cid in level:
            cl = tree.clique(cid)
            if cl.is_recycled and cl.status == CliqStatus.UPRECYCLED:
                cached = old_msgs.get(cl.signature())
                if cached is not None:
                    msg = GaussianMessage(cl.cid, cached.variables,
                                          cached.points, cached.cov)
                    up_msgs[cl.cid] = msg
                    tree.param_up_msgs[cl.signature()] = msg
                    continue
            sub = build_clique_subgraph(fg, cl)
            for ch in cl.children:
                if ch in up_msgs:
                    _attach_message(sub, up_msgs[ch], "up")
            entries.append((cl, sub, ParametricProblem(sub)))
        res = solve_problems_batched([p for _, _, p in entries],
                                     mesh=mesh)
        for (cl, sub, prob), (points, cov, _) in zip(entries, res):
            _finalize_clique(prob, sub, points, cov)
            msg = _marginal_message(prob, sub, cl)
            up_msgs[cl.cid] = msg
            tree.param_up_msgs[cl.signature()] = msg
            cl.status = CliqStatus.UPSOLVED
            for v in cl.frontals:
                fv = fg.var(v)
                fv.parametric_point = sub.var(v).parametric_point
                fv.parametric_cov = sub.var(v).parametric_cov

    # ---- down sweep: pin separators from the solved parents ----
    for level in levels:
        entries = []
        for cid in level:
            cl = tree.clique(cid)
            if cl.parent is None:
                cl.status = CliqStatus.DOWNSOLVED
                continue
            sub = build_clique_subgraph(fg, cl)
            for ch in cl.children:
                if ch in up_msgs:
                    _attach_message(sub, up_msgs[ch], "dwn")
            # separators already carry the parent's solved values
            entries.append((cl, sub,
                            ParametricProblem(sub, frozen=cl.separator)))
        res = solve_problems_batched([p for _, _, p in entries],
                                     mesh=mesh)
        for (cl, sub, prob), (points, cov, _) in zip(entries, res):
            _finalize_clique(prob, sub, points, cov)
            cl.status = CliqStatus.DOWNSOLVED
            for v in cl.frontals:
                fv = fg.var(v)
                fv.parametric_point = sub.var(v).parametric_point
                fv.parametric_cov = sub.var(v).parametric_cov
                fv.ppe["parametric"] = {
                    "mean": fv.parametric_point,
                    "max": fv.parametric_point,
                    "suggested": fv.parametric_point}

    for v in fg.variables.values():
        if v.solvable and v.parametric_point is not None:
            v.solved_count["parametric"] = \
                v.get_solved_count("parametric") + 1
    fg.solve_count += 1
    return tree
