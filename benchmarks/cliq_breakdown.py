"""Host-time breakdown of the warm per-clique solve cost (VERDICT r3
weakness 1: 'no profile exists of where the ~1.3 ms goes').

Monkeypatch-timers bucket the wide-32 sequential sweep's host work:
subgraph build, message prep, init cycling, chain-plan fetch, device-model
fetch, kernel dispatch, belief write-back, message prep out.  Run on the
TPU (axon) or CPU; prints a table plus the bench-style and solve-only
clique rates (best of 3).
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

if __name__ == "__main__" and "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/jaxcache-tpu" if "--cpu" not in sys.argv
                  else "/tmp/jaxcache-verify")
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,  # noqa: E402
                                         Normal, Prior, initfg, solve_tree)
from incrementalinference.jl_tpu.config import SolverParams  # noqa: E402

BUCKETS: dict = {}


def timed(bucket, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            BUCKETS[bucket] = BUCKETS.get(bucket, 0.0) + \
                (time.perf_counter() - t0)
    return wrap


def instrument():
    import incrementalinference.jl_tpu.ops.graphops as go
    import incrementalinference.jl_tpu.parallel.messages as pm
    import incrementalinference.jl_tpu.parallel.scheduler as sched

    sched.build_clique_subgraph = timed("subgraph_build",
                                        sched.build_clique_subgraph)
    sched.add_down_variable_factors = timed("down_widen",
                                            sched.add_down_variable_factors)
    sched._cycle_init_by_var_order = timed("init_cycle",
                                           sched._cycle_init_by_var_order)
    sched._build_chain_plan = timed("chain_plan", sched._build_chain_plan)
    sched.transfer_update_subgraph = timed("belief_writeback",
                                           sched.transfer_update_subgraph)
    sched.prep_msg_up = timed("msg_prep", sched.prep_msg_up)
    sched.prep_msg_down = timed("msg_prep", sched.prep_msg_down)
    sched.add_msg_factors = timed("msg_prep", sched.add_msg_factors)
    go.device_model = timed("device_model", go.device_model)
    # the chain dispatch itself: wrap the plan fn getter result
    orig_gibbs_chain = sched._gibbs_solve_chain

    def gibbs_chain(*a, **k):
        t0 = time.perf_counter()
        try:
            return orig_gibbs_chain(*a, **k)
        finally:
            BUCKETS["gibbs_chain_total"] = \
                BUCKETS.get("gibbs_chain_total", 0.0) + \
                (time.perf_counter() - t0)
    sched._gibbs_solve_chain = gibbs_chain


def wide_forest(n=32):
    fg = initfg(SolverParams(batch_cliques=False))
    for b in range(n):
        fg.add_variable(f"b{b}x0", ContinuousScalar)
        fg.add_factor([f"b{b}x0"], Prior(Normal(float(b), 0.5)))
        fg.add_variable(f"b{b}x1", ContinuousScalar)
        fg.add_factor([f"b{b}x0", f"b{b}x1"],
                      LinearRelative(Normal(1.0, 0.5)))
    return fg


def main():
    solve_tree(wide_forest())
    solve_tree(wide_forest())                      # warm all structures

    best_total, best_solve = 1e9, 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fg = wide_forest()
        t1 = time.perf_counter()
        tree = solve_tree(fg)
        t2 = time.perf_counter()
        best_total = min(best_total, t2 - t0)
        best_solve = min(best_solve, t2 - t1)
    n = 2 * tree.num_cliques()

    instrument()
    BUCKETS.clear()
    fg = wide_forest()
    t0 = time.perf_counter()
    solve_tree(fg)
    wall = time.perf_counter() - t0
    known = sum(v for k, v in BUCKETS.items() if k != "gibbs_chain_total")
    chain = BUCKETS.get("gibbs_chain_total", 0.0)
    # chain total includes plan + device_model, subtract to get dispatch
    dispatch = chain - BUCKETS.get("chain_plan", 0.0) \
        - BUCKETS.get("device_model", 0.0)

    print(f"\nwide-32 warm sweep breakdown ({n} clique solves, "
          f"instrumented wall {wall*1e3:.1f} ms):")
    rows = [(k, v) for k, v in sorted(BUCKETS.items(),
                                      key=lambda kv: -kv[1])
            if k != "gibbs_chain_total"]
    rows.append(("chain_dispatch(jit call)", dispatch))
    rows.append(("other(sweep control flow)", wall - known - dispatch))
    for k, v in rows:
        print(f"  {k:<26} {v*1e3:7.2f} ms  ({v/n*1e6:6.0f} us/clique)")
    print(f"\nbench-style rate (build+graphinit+solve): "
          f"{n/best_total:.0f} cliq/s")
    print(f"solve-only rate: {n/best_solve:.0f} cliq/s")


if __name__ == "__main__":
    main()
