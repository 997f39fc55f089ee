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

    if tree is None:
        tree = build_tree(fg)

    plans: Dict = {}
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

    def compile_one(plan: UpdatePlan):
        fn = _fused_fn(plan.manifold, plan.specs, plan.masks, plan.n_out)
        key = jax.random.PRNGKey(0)
        try:
            fn.lower(plan.models, plan.nested, plan.old_points,
                     key).compile()
        except Exception:                     # noqa: BLE001
            pass                              # never fail a solve over this

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        list(pool.map(compile_one, plans.values()))
    return len(plans)
