"""Thread-parallel pre-compilation of a solve's kernel structures.

First-time solves are XLA-compile-bound: every distinct (factor-structure,
shape) fused update compiles serially on first use (10-40 s each on TPU).
Compilation releases the GIL, so lowering + compiling the distinct
structures from a thread pool overlaps them; the persistent compilation
cache then serves the actual solve.  The reference has the same role in
Julia's precompile workload (src/IncrementalInference.jl:242-249), which is
likewise serial — this is the TPU-native improvement on it.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional

import jax

from ..tree.bayestree import BayesTree, build_tree
from .messages import add_msg_factors, LikelihoodMessage
from .scheduler import build_clique_subgraph

__all__ = ["precompile_updates"]


def precompile_updates(fg, tree: Optional[BayesTree] = None,
                       max_workers: int = 8,
                       solve_key: str = "default") -> int:
    """Compile every distinct fused-update structure the tree solve will
    hit, in parallel.  Returns the number of distinct structures compiled.

    Message-factor structures are anticipated by attaching placeholder
    child-message priors (what the up sweep will add) before planning.
    """
    from ..beliefs import make_belief
    from ..ops.fused import _fused_fn
    from ..ops.graphops import UpdatePlan, prepare_update
    from ..tree.bayestree import CliqStatus
    from .scheduler import _build_chain_plan, _use_chain

    if tree is None:
        tree = build_tree(fg)

    plans: Dict = {}
    chain_jobs: Dict = {}
    use_chain = _use_chain(fg.params)
    for cl in tree.cliques.values():
        sub = build_clique_subgraph(fg, cl)
        # placeholder child up-messages: one MsgPrior per child separator var
        for ch in tree.children(cl.cid):
            msg = LikelihoodMessage(sender=ch.cid,
                                    status=CliqStatus.UPSOLVED)
            for vlbl in ch.separator:
                if vlbl in sub.variables:
                    v = sub.var(vlbl)
                    msg.beliefs[vlbl] = make_belief(
                        v.manifold, sub.points(vlbl, solve_key))
            add_msg_factors(sub, msg)
        for var in cl.all_vars:
            plan = prepare_update(sub, var, sub.factors_of(var),
                                  solve_key=solve_key)
            if isinstance(plan, UpdatePlan):
                plans.setdefault(plan.structure_key, plan)
        if use_chain:
            # the fused whole-clique chain program — the production TPU
            # up-solve path — compiles per clique-structure signature;
            # pre-building it here overlaps the dominant cold cost
            try:
                cplan, store, _ = _build_chain_plan(
                    sub, cl, list(cl.direct_vars), list(cl.iter_vars),
                    solve_key)
            except Exception:                 # noqa: BLE001
                cplan, store = False, None
            if cplan not in (True, False) and store is not None:
                models_d = tuple(tuple(sub.factor(fl).model for fl in fls)
                                 for fls in cplan.direct_labels)
                models_i = tuple(tuple(sub.factor(fl).model for fl in fls)
                                 for fls in cplan.iter_labels)
                # the runtime jit cache keys on the models' pytree
                # structure too — without it, two cliques with identical
                # step/shape layouts but different model types would
                # collide here and only one chain program gets prewarmed
                # (advisor r2)
                sig = (cplan.direct_steps, cplan.iter_steps,
                       tuple(p.shape for p in store),
                       jax.tree_util.tree_structure((models_d, models_i)))
                chain_jobs.setdefault(
                    sig, (cplan, models_d, models_i, tuple(store)))

    n_rounds = fg.params.gibbs_iters

    def compile_one(plan: UpdatePlan):
        fn = _fused_fn(plan.manifold, plan.specs, plan.masks, plan.n_out)
        key = jax.random.PRNGKey(0)
        try:
            fn.lower(plan.models, plan.nested, plan.old_points,
                     key).compile()
        except Exception:                     # noqa: BLE001
            pass                              # never fail a solve over this

    def compile_chain(job):
        cplan, models_d, models_i, store = job
        try:
            cplan.fn(n_rounds).lower(models_d, models_i, store,
                                     jax.random.PRNGKey(0)).compile()
        except Exception:                     # noqa: BLE001
            pass

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [pool.submit(compile_one, p) for p in plans.values()]
        futs += [pool.submit(compile_chain, j) for j in chain_jobs.values()]
        for f in futs:
            f.result()
    return len(plans) + len(chain_jobs)
