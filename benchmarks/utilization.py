"""Device-utilization accounting + the accuracy-vs-N trade (VERDICT r2
item 2: every perf number was host-dispatch wall-clock; this adds the
compute-utilization leg and measures what raising N actually buys).

Part 1 — FLOP accounting: XLA ``cost_analysis`` over the distinct fused
whole-clique chain programs a LineStep(20) up sweep dispatches, weighted
by structure multiplicity -> estimated FLOPs + HBM bytes per sweep;
combined with the measured warm solve wall -> achieved FLOP/s and percent
of the v5e-1 peak.

Part 2 — N sweep: N in {100, 512, 2048, 8192} on LineStep(20) (max
mean-vs-truth error) and the fourdoor sequence (mode mass on the true
door after full collapse), warm walls; shows the accuracy-per-second
curve the nearly-free particle axis buys.

Usage: python benchmarks/utilization.py [--part 1|2]
"""
import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
# keep XLA per-fusion cache paths OUT of the compile options: they embed
# the cache DIRECTORY PATH into every cache key, so entries only ever hit
# from the exact same directory (bisected 2026-08-21: a copied cache got
# ZERO hits until this was disabled; with it, 42/42 hits and 53s -> 13s)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

# v5e single chip peaks (public spec): 197 TFLOP/s bf16, ~98.5 f32-ish via
# bf16x3 passes; HBM 819 GB/s.  The solver runs f32 with HIGHEST-precision
# matmuls, so percent-of-peak is quoted against the bf16 number as the
# hard ceiling (honest direction: real attainable f32 peak is lower).
PEAK_FLOPS_BF16 = 197e12
PEAK_HBM_BPS = 819e9


def _chain_programs(fg, tree, solve_key="default"):
    """(compiled-cost, count) of each distinct fused chain structure the up
    sweep dispatches — the same enumeration precompile_updates performs."""
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
        from incrementalinference.jl_tpu.ops.graphops import device_model
        models_d = tuple(tuple(device_model(sub.factor(fl)) for fl in fls)
                         for fls in plan.direct_labels)
        models_i = tuple(tuple(device_model(sub.factor(fl)) for fl in fls)
                         for fls in plan.iter_labels)
        sig = (plan.direct_steps, plan.iter_steps,
               tuple(p.shape for p in store),
               jax.tree_util.tree_structure((models_d, models_i)))
        counts[sig] = counts.get(sig, 0) + 1
        jobs.setdefault(sig, (plan, models_d, models_i, tuple(store)))
    out = []
    for sig, (plan, md, mi, store) in jobs.items():
        comp = plan.fn(fg.params.gibbs_iters).lower(
            md, mi, store, jax.random.PRNGKey(0)).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        out.append((float(ca.get("flops", 0.0)),
                    float(ca.get("bytes accessed", 0.0)), counts[sig]))
    return out


def part1():
    from incrementalinference.jl_tpu import solve_tree
    from incrementalinference.jl_tpu.canonical import generate_line_step
    from incrementalinference.jl_tpu.tree.bayestree import build_tree

    fg = generate_line_step(20, graphinit=True)
    tree = build_tree(fg)
    progs = _chain_programs(fg, tree)
    flops = sum(f * c for f, _, c in progs)
    bts = sum(b * c for _, b, c in progs)
    print(f"# LineStep(20) up sweep: {len(progs)} distinct chain programs, "
          f"{sum(c for _, _, c in progs)} dispatches, "
          f"est {flops/1e9:.2f} GFLOP, {bts/1e9:.2f} GB accessed, "
          f"arith intensity {flops/max(bts,1):.1f} flop/B", flush=True)

    fg2 = generate_line_step(20, graphinit=True)
    solve_tree(fg2)                                   # warm
    fg3 = generate_line_step(20, graphinit=True)
    t0 = time.time()
    solve_tree(fg3)
    jax.block_until_ready([fg3.points(v) for v in fg3.ls()])
    wall = time.time() - t0
    # the down sweep dispatches approximately the same program family, so
    # a full solve is ~2x the up-sweep FLOPs (stated estimate, not a claim
    # of exactness)
    est_total = 2 * flops
    print(f"# warm solve wall {wall*1e3:.1f} ms -> achieved "
          f"~{est_total/wall/1e9:.1f} GFLOP/s = "
          f"{100*est_total/wall/PEAK_FLOPS_BF16:.4f}% of v5e bf16 peak "
          f"(dispatch-bound by design: ~{2*sum(c for _,_,c in progs)} "
          f"kernels in {wall*1e3:.0f} ms)", flush=True)


def part2():
    from incrementalinference.jl_tpu import solve_tree
    from incrementalinference.jl_tpu.canonical import (fourdoor_sequence,
                                                       generate_line_step)
    from incrementalinference.jl_tpu.config import SolverParams

    print("# N-sweep (warm walls; quality: linestep max |mean-truth|, "
          "fourdoor mode mass on the true door)", flush=True)
    for N in (100, 512, 2048, 8192):
        params = SolverParams(N=N)
        # linestep
        fg = generate_line_step(20, graphinit=True, params=params)
        solve_tree(fg)                                # warm this N's shapes
        fg = generate_line_step(20, graphinit=True, params=params)
        t0 = time.time()
        solve_tree(fg)
        jax.block_until_ready([fg.points(v) for v in fg.ls()])
        w_ls = time.time() - t0
        errs = []
        for v in fg.ls():
            if v.startswith("x"):          # pose id == ground truth
                i = int(v[1:])
                errs.append(abs(float(np.asarray(
                    fg.points(v))[:, 0].mean()) - float(i)))
        # fourdoor: one untimed pass first — the sequence compiles fresh
        # chain structures per N, which would otherwise dominate the wall
        fg4, steps = fourdoor_sequence(SolverParams(N=N))
        tree = None
        for s in steps:
            s()
            tree = solve_tree(fg4, old_tree=tree)
        fg4, steps = fourdoor_sequence(SolverParams(N=N))
        tree = None
        t0 = time.time()
        for s in steps:
            s()
            tree = solve_tree(fg4, old_tree=tree)
        jax.block_until_ready(fg4.points("x1"))
        w_fd = time.time() - t0
        p1 = np.asarray(fg4.points("x1"))[:, 0]
        mode_mass = float(np.mean(np.abs(p1 - 0.0) < 15.0))
        print(f"# N={N:5d}: linestep20 {w_ls*1e3:7.1f} ms "
              f"(max err {max(errs):5.2f}), fourdoor {w_fd*1e3:7.1f} ms "
              f"(mode mass {mode_mass:.2f})", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", type=int, default=0)
    a = ap.parse_args()
    if a.part in (0, 1):
        part1()
    if a.part in (0, 2):
        part2()
