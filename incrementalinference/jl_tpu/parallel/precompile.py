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
                       solve_key: str = "default",
                       shard: Optional[tuple] = None) -> int:
    """Compile every distinct fused-update structure the tree solve will
    hit, in parallel.  Returns the number of distinct structures compiled.

    Message-factor structures are anticipated by attaching placeholder
    child-message priors (what the up sweep will add) before planning.

    ``shard=(i, k)``: compile only every k-th distinct structure starting
    at i (deterministic enumeration order) — the unit of work for the
    process-parallel farm (:func:`precompile_processes`).
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

    def note_chain(sub, cl, direct, iters):
        """Plan one fused chain structure and queue its compile."""
        try:
            cplan, store, _ = _build_chain_plan(sub, cl, list(direct),
                                                list(iters), solve_key)
        except Exception:                     # noqa: BLE001
            cplan, store = False, None
        if cplan not in (True, False) and store is not None:
            from ..ops.graphops import device_model
            models_d = tuple(tuple(device_model(sub.factor(fl))
                                   for fl in fls)
                             for fls in cplan.direct_labels)
            models_i = tuple(tuple(device_model(sub.factor(fl))
                                   for fl in fls)
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

    def attach_child_msgs(sub, cl):
        # placeholder child up-messages: one MsgPrior per child separator
        for ch in tree.children(cl.cid):
            msg = LikelihoodMessage(sender=ch.cid,
                                    status=CliqStatus.UPSOLVED)
            for vlbl in ch.separator:
                if vlbl in sub.variables:
                    v = sub.var(vlbl)
                    msg.beliefs[vlbl] = make_belief(
                        v.manifold, sub.points(vlbl, solve_key))
            add_msg_factors(sub, msg)

    for cl in tree.cliques.values():
        sub = build_clique_subgraph(fg, cl)
        attach_child_msgs(sub, cl)
        for var in cl.all_vars:
            plan = prepare_update(sub, var, sub.factors_of(var),
                                  solve_key=solve_key)
            if isinstance(plan, UpdatePlan):
                plans.setdefault(plan.structure_key, plan)
        if use_chain:
            # the fused whole-clique chain program — the production TPU
            # up-solve path — compiles per clique-structure signature;
            # pre-building it here overlaps the dominant cold cost
            note_chain(sub, cl, cl.direct_vars, cl.iter_vars)

            # DOWN-solve chain structure, constructed EXACTLY as
            # down_solve_clique does (same widening predicate, same
            # factor-insertion order) — a guessed variant compiles dead
            # programs, which is worse than not precompiling at all.
            # Only meaningful when the graph is already initialized (the
            # widening predicate matches the runtime one then).
            if all(fg.var(v).is_initialized(solve_key)
                   for v in cl.all_vars):
                from .scheduler import (_DescendantFrontals,
                                        add_down_variable_factors)
                dsub = build_clique_subgraph(fg, cl)
                add_down_variable_factors(
                    fg, dsub, cl, require_initialized=solve_key,
                    exclude=_DescendantFrontals(tree, cl.cid))
                attach_child_msgs(dsub, cl)
                if cl.parent is not None:
                    dmsg = LikelihoodMessage(sender=cl.parent,
                                             status=CliqStatus.DOWNSOLVED,
                                             direction="down")
                    for vlbl in cl.separator:
                        if vlbl in dsub.variables:
                            v = dsub.var(vlbl)
                            dmsg.beliefs[vlbl] = make_belief(
                                v.manifold, dsub.points(vlbl, solve_key))
                    add_msg_factors(dsub, dmsg)
                    for vlbl in cl.separator:
                        if vlbl in dsub.variables:
                            dsub.var(vlbl).marginalized = True
                iter_f = [v for v in cl.iter_vars if v in cl.frontals]
                direct_f = [v for v in cl.frontals if v not in iter_f]
                note_chain(dsub, cl, direct_f, iter_f)

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

    jobs = [(compile_one, p) for p in plans.values()] \
        + [(compile_chain, j) for j in chain_jobs.values()]
    if shard is not None:
        i, k = shard
        jobs = jobs[i::k]

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        futs = [pool.submit(fn, arg) for fn, arg in jobs]
        for f in futs:
            f.result()
    return len(jobs)


class _Farm:
    """Handle to a running precompile farm (``wait()`` before solving)."""

    def __init__(self, procs, timeout):
        self.procs = procs
        self.timeout = timeout

    def wait(self) -> int:
        n_ok = 0
        for p in self.procs:
            try:
                p.wait(timeout=self.timeout)
                n_ok += int(p.returncode == 0)
            except Exception:                 # noqa: BLE001
                p.kill()
        return n_ok


class _DoneFarm:
    """Farm-shaped handle for work already completed in-process (the
    no-persistent-cache fallback): ``wait()`` is a no-op returning the
    structure count, so callers can treat both paths uniformly."""

    def __init__(self, n: int):
        self.n = n

    def wait(self) -> int:
        return self.n


def precompile_processes(fg, tree: Optional[BayesTree] = None,
                         n_procs: int = 2, solve_key: str = "default",
                         timeout: float = 600.0, wait: bool = True):
    """Process-parallel cold-compile farm.

    The in-process PJRT compile path serializes (measured: two threads
    compiling distinct programs overlap <10%), but compiles from SEPARATE
    processes overlap nearly perfectly — so the distinct structures are
    sharded across ``n_procs`` worker processes that compile into the
    SHARED persistent compilation cache; the solve then loads every
    program from cache.  Workers receive the graph via packed
    serialization and re-derive the identical job list (deterministic
    enumeration).  This is the TPU-native answer to the reference's
    serial Julia precompile workload (src/IncrementalInference.jl:242-249)
    at cold-start scale."""
    import os
    import subprocess
    import sys
    import tempfile

    from ..serialization import save_graph

    cache_dir = jax.config.jax_compilation_cache_dir
    if not cache_dir:
        # no persistent cache → workers could not hand results back; run
        # in-process, wrapped so wait=False callers still get .wait()
        n = precompile_updates(fg, tree, solve_key=solve_key)
        return n if wait else _DoneFarm(n)
    if tree is None:
        tree = build_tree(fg)

    tmp = tempfile.mkdtemp(prefix="iitpu_precompile_")
    gpath = os.path.join(tmp, "graph.json")
    save_graph(fg, gpath)
    opath = os.path.join(tmp, "order.txt")
    with open(opath, "w") as fp:
        fp.write("\n".join(tree.elimination_order))

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, "-m",
         "incrementalinference.jl_tpu.parallel.precompile",
         "--graph", gpath, "--order", opath, "--cache", cache_dir,
         "--shard", f"{i}:{n_procs}", "--solve-key", solve_key],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for i in range(n_procs)]
    farm = _Farm(procs, timeout)
    return farm.wait() if wait else farm


def _worker_main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", required=True)
    ap.add_argument("--order", required=True)
    ap.add_argument("--cache", required=True)
    ap.add_argument("--shard", required=True)     # "i:k"
    ap.add_argument("--solve-key", default="default")
    a = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", a.cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # the default setting embeds the cache DIR PATH in every compile-cache
    # key (via the XLA autotune-cache option) — without this, entries the
    # farm writes are keyed differently from the solving process's lookups
    # and never hit (bisected 2026-08-21; every consumer process sets it)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

    from ..serialization import load_graph

    fg = load_graph(a.graph)
    with open(a.order) as fp:
        order = [ln.strip() for ln in fp if ln.strip()]
    tree = build_tree(fg, order=order)
    i, k = a.shard.split(":")
    precompile_updates(fg, tree, solve_key=a.solve_key,
                       shard=(int(i), int(k)))


if __name__ == "__main__":
    _worker_main()
