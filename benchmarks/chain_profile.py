"""Profile the fused whole-clique Gibbs chain programs (VERDICT r4 weak
#1 / round-5 item #1): true per-execution device time and optimized-HLO
size of each distinct chain program, and its N-scaling.

Measurement methodology (round-5 correction): K chained executions ride
INSIDE one jitted lax.scan (output store fed back as carry), and one
scalar read at the end forces completion.  total_wall = tunnel floor
(~32 ms scalar-read round trip on the axon runtime) + K * device_time.
An EXTERNAL python loop of dispatches — the round-4 method — measures
the ~3.5 ms/program host+tunnel dispatch cost instead and overstated the
deepest clique by ~3x (the r4 "~10 ms at both N=512 and N=2048" row).

Usage: python benchmarks/chain_profile.py [--N 2048] [--reps 100]
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

TUNNEL_FLOOR_S = 0.032


def chain_jobs(fg, tree, solve_key="default"):
    from incrementalinference.jl_tpu.ops.graphops import device_model
    from incrementalinference.jl_tpu.beliefs import make_belief
    from incrementalinference.jl_tpu.parallel.messages import (
        LikelihoodMessage, add_msg_factors)
    from incrementalinference.jl_tpu.parallel.scheduler import (
        _build_chain_plan, build_clique_subgraph)
    from incrementalinference.jl_tpu.tree.bayestree import CliqStatus

    jobs, counts = {}, {}
    for cl in tree.cliques.values():
        sub = build_clique_subgraph(fg, cl)
        for ch in tree.children(cl.cid):
            msg = LikelihoodMessage(sender=ch.cid, status=CliqStatus.UPSOLVED)
            for vlbl in ch.separator:
                if vlbl in sub.variables:
                    v = sub.var(vlbl)
                    msg.beliefs[vlbl] = make_belief(
                        v.manifold, sub.points(vlbl, solve_key))
            add_msg_factors(sub, msg)
        plan, store, _ = _build_chain_plan(
            sub, cl, list(cl.direct_vars), list(cl.iter_vars), solve_key)
        if plan in (True, False) or store is None:
            continue
        models_d = tuple(tuple(device_model(sub.factor(fl)) for fl in fls)
                         for fls in plan.direct_labels)
        models_i = tuple(tuple(device_model(sub.factor(fl)) for fl in fls)
                         for fls in plan.iter_labels)
        sig = (plan.direct_steps, plan.iter_steps,
               tuple(p.shape for p in store),
               jax.tree_util.tree_structure((models_d, models_i)))
        counts[sig] = counts.get(sig, 0) + 1
        jobs.setdefault(sig, (plan, models_d, models_i, tuple(store)))
    return [(plan, md, mi, store, counts[sig])
            for sig, (plan, md, mi, store) in jobs.items()]


def profile(N: int, reps: int):
    from incrementalinference.jl_tpu.canonical import generate_line_step
    from incrementalinference.jl_tpu.config import SolverParams
    from incrementalinference.jl_tpu.ops.fused import _make_clique_chain
    from incrementalinference.jl_tpu.tree.bayestree import build_tree

    params = SolverParams(N=N)
    fg = generate_line_step(20, graphinit=True, params=params)
    tree = build_tree(fg)
    jobs = chain_jobs(fg, tree)
    print(f"# N={N}: {len(jobs)} distinct chain programs", flush=True)

    rows = []
    for plan, md, mi, store, cnt in jobs:
        body = _make_clique_chain(plan.direct_steps, plan.iter_steps,
                                  fg.params.gibbs_iters)

        def loop(st):
            def step(c, k):
                out_store, _, _ = body(md, mi, c, k)
                return tuple(jnp.reshape(o, s.shape)
                             for o, s in zip(out_store, c)), None
            out, _ = jax.lax.scan(
                step, st, jax.random.split(jax.random.PRNGKey(5), reps))
            return out

        f = jax.jit(loop)
        comp = f.lower(tuple(store)).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        try:
            n_ops = comp.as_text().count("\n")
        except Exception:
            n_ops = -1
        out = f(tuple(store))
        jax.block_until_ready(out)
        _ = float(np.asarray(out[0]).ravel()[0])      # drain the tunnel
        t0 = time.time()
        out = f(tuple(store))
        _ = float(np.asarray(out[0]).ravel()[0])
        wall = max(time.time() - t0 - TUNNEL_FLOOR_S, 1e-9) / reps
        flops = float(ca.get("flops", 0.0)) / reps
        rows.append((wall, n_ops, flops, cnt, len(plan.direct_steps),
                     len(plan.iter_steps)))
        print(f"#   chain d={len(plan.direct_steps)} "
              f"i={len(plan.iter_steps)} x{cnt}: {wall*1e6:8.1f} us/exec, "
              f"~{n_ops} hlo lines (K-rep module), "
              f"{flops/1e9:.3f} GFLOP -> {flops/max(wall,1e-9)/1e9:.1f} "
              f"GFLOP/s", flush=True)
    worst = max(rows)
    sweep_dev = sum(r[0] * r[3] for r in rows)
    print(f"# deepest: {worst[0]*1e6:.1f} us/exec; full up-sweep device "
          f"time ~{sweep_dev*1e3:.2f} ms", flush=True)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--N", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=100)
    a = ap.parse_args()
    profile(a.N, a.reps)
