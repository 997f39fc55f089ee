"""Benchmark entry — prints ONE JSON line for the driver.

Headline: wall-clock of a full nonparametric MM-iSAM tree solve on the
canonical LineStep(20) graph (reference fixture
src/services/CanonicalGraphExamples.jl:154-236) on the available accelerator.
Both the COLD wall (first solve including XLA compiles, with
``precompile=True`` parallel compilation) and the WARM wall (cached
compiles) are reported — the JSON ``value`` is the warm number (matching
the reference's PkgBenchmark setup, which excludes Julia JIT warmup,
benchmark/benchmarks.jl:13-60), and ``cold`` rides alongside so no single
number hides compile time.

``vs_baseline`` is speedup vs. the reference's time budget for this suite:
the reference allots 90 s per mmisam-solve benchmark sample
(benchmark/runbenchmarks.jl budget; no published absolute numbers exist —
BASELINE.md), so vs_baseline = 90.0 / value.

Extra metrics run in SUBPROCESSES with hard timeouts: a wedged TPU-tunnel
device->host transfer (observed: blocking reads stalling minutes) must
never take the whole bench down with it.  Run ``python bench.py --extra
<name>`` to run one extra inline.
"""

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
# keep XLA per-fusion cache paths OUT of the compile options: they embed
# the cache DIRECTORY PATH into every cache key, so entries only ever hit
# from the exact same directory (bisected 2026-08-21: a copied cache got
# ZERO hits until this was disabled; with it, 42/42 hits and 53s -> 13s)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# seed the shipped warm-start program pack (no-op when entries exist or
# the accelerator/jax version differs — see warmstart.py); the seed report
# and a live persistent-cache hit counter surface whether the pack served
# the cold solve (a version-mismatch miss logs one clear line)
from incrementalinference.jl_tpu.warmstart import (  # noqa: E402
    install_hit_counter, seed_cache)

_SEED_REPORT: dict = {}
seed_cache(report=_SEED_REPORT)
_CACHE_COUNTS = install_hit_counter()

from incrementalinference.jl_tpu import solve_tree  # noqa: E402
from incrementalinference.jl_tpu.canonical import generate_line_step  # noqa: E402


def run_once(precompile=False):
    fg = generate_line_step(20, graphinit=True)
    t0 = time.time()
    solve_tree(fg, precompile=precompile)
    # block on device completion — dispatch is async and host-side wall
    # alone would under-measure
    jax.block_until_ready([fg.points(v) for v in fg.ls()])
    return time.time() - t0


def _report(label, cold, warm):
    print(f"# {label}: cold {cold:.2f}s / warm {warm:.2f}s", file=sys.stderr)


def extra_fourdoor():
    from incrementalinference.jl_tpu.canonical import fourdoor_sequence

    def once():
        fg, steps = fourdoor_sequence()
        tree = None
        t0 = time.time()
        for s in steps:
            s()
            tree = solve_tree(fg, old_tree=tree)
        jax.block_until_ready([fg.points(v) for v in fg.ls()])
        return time.time() - t0

    cold = once()
    _report("fourdoor 3-solve sequence", cold, once())


def extra_hexagonal():
    from incrementalinference.jl_tpu.canonical import generate_hexagonal

    def once():
        fg = generate_hexagonal(graphinit=True)
        t0 = time.time()
        solve_tree(fg, precompile=True)
        jax.block_until_ready([fg.points(v) for v in fg.ls()])
        return time.time() - t0

    cold = once()
    _report("hexagonal SE2 nonparametric", cold, once())


def extra_parametric30():
    from incrementalinference.jl_tpu.parametric import solve_graph_parametric

    def once():
        fg = generate_line_step(30, graphinit=False)
        t0 = time.time()
        r = solve_graph_parametric(fg)
        jax.block_until_ready([fg.var(v).parametric_point for v in fg.ls()])
        return time.time() - t0

    cold = once()
    _report("linestep30 parametric batch", cold, once())


def _wide_forest(params):
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg)
    fg = initfg(params)
    for b in range(32):
        fg.add_variable(f"b{b}x0", ContinuousScalar)
        fg.add_factor([f"b{b}x0"], Prior(Normal(float(b), 0.5)))
        fg.add_variable(f"b{b}x1", ContinuousScalar)
        fg.add_factor([f"b{b}x0", f"b{b}x1"],
                      LinearRelative(Normal(1.0, 0.5)))
    return fg


def extra_cliqrate():
    # clique-solves/s on one chip (the BASELINE.json north-star unit):
    # a wide 32-branch forest = 64 clique solves per full sweep pair.
    # Sequential path: bounded compile footprint (the stacked B=64 kernel
    # is a multi-minute one-time compile; measure it offline instead).
    # Two rates, best of 3 (the tunnel's latency wobbles minute-to-minute):
    # the historical bench-style number times graph build + graphinit +
    # solve (comparable to r1-r3 records); solve-only isolates the sweep
    # (benchmarks/cliq_breakdown.py publishes the host-time buckets)
    from incrementalinference.jl_tpu.config import SolverParams

    pr = SolverParams(batch_cliques=False)
    tree = solve_tree(_wide_forest(pr))             # warm
    tree = solve_tree(_wide_forest(pr))
    best_total = best_solve = 1e9
    for _ in range(3):
        t0 = time.time()
        fg = _wide_forest(pr)
        t1 = time.time()
        tree = solve_tree(fg)
        t2 = time.time()
        best_total = min(best_total, t2 - t0)
        best_solve = min(best_solve, t2 - t1)
    nsolves = 2 * tree.num_cliques()                # up + down
    print(f"# clique-solves/s (1 chip, wide32 sequential): "
          f"{nsolves / best_total:.0f} incl. build+graphinit, "
          f"{nsolves / best_solve:.0f} solve-only", file=sys.stderr)


def extra_param_cliqrate():
    from incrementalinference.jl_tpu.config import SolverParams

    pr = SolverParams(batch_cliques=False)
    t0 = time.time()
    tree = solve_tree(_wide_forest(pr), algorithm="parametric")    # warm
    cold_dt = time.time() - t0
    # best-of-3 both ways: single-shot timings through the tunnel wobble
    # 2-4x minute to minute (same methodology as the nonparametric extra)
    fresh_dt = 1e9
    for _ in range(3):
        t0 = time.time()
        fg = _wide_forest(pr)
        tree = solve_tree(fg, algorithm="parametric")
        fresh_dt = min(fresh_dt, time.time() - t0)
    # same-graph STEADY-STATE re-solve: repeated solves of a live graph
    # (the incremental/production case — structural group cache + warm
    # linearization points).  Later re-solves start from converged p0, so
    # their LM loops exit early: this metric is the steady-state floor,
    # NOT the first re-solve after a change (that cost is the fresh-graph
    # number's solve portion).  On the dispatch-ACK runtime the host wall
    # is iteration-count-independent anyway; the label keeps the
    # distinction honest for runtimes with completion semantics.
    dt = 1e9
    for _ in range(3):
        t0 = time.time()
        tree = solve_tree(fg, algorithm="parametric")
        dt = min(dt, time.time() - t0)
    print(f"# parametric clique-solves/s (1 chip, wide32 batched): "
          f"{2 * tree.num_cliques() / dt:.0f} steady-state re-solve / "
          f"{2 * tree.num_cliques() / fresh_dt:.0f} fresh-graph "
          f"(cold sweep {cold_dt:.2f}s)", file=sys.stderr)


def extra_incremental():
    # incremental growth with the wildfire down-gate: re-solve cost per
    # appended pose on a long chain (reference has no analogue — recycled
    # cliques always redo their down pass there)
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg)
    from incrementalinference.jl_tpu.config import SolverParams

    def grown(n, params):
        fg = initfg(params)
        fg.add_variable("x0", ContinuousScalar)
        fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
        for i in range(n):
            fg.add_variable(f"x{i+1}", ContinuousScalar)
            fg.add_factor([f"x{i}", f"x{i+1}"],
                          LinearRelative(Normal(10.0, 1.0)))
        return fg

    # two chain lengths: the gate's saving is the skipped host-side
    # down-solve work (subgraph build + widen + dispatch), which scales
    # with the recycled-tree size, while its cost is ~one device sync per
    # step — so the win grows with chain length (VERDICT r2 item 5)
    # "auto" resolves per solve: OFF below the measured ~64-recycled-clique
    # crossover (chain30 ⇒ reference semantics), ON above it (chain120 ⇒
    # gate active) — scheduler.WILDFIRE_AUTO_MIN_RECYCLED
    # De-noised reporting (VERDICT r4 item #9): per-step walls are
    # measured individually over >=8 steps and reported as median with
    # min/max spread — the single-shot 4-step average wobbled 2x+ with
    # tunnel latency and mis-calibrated the "auto" crossover in round 4.
    import statistics
    medians = {}
    for base in (30, 120):
        for label, wt in (("reference-semantics", 0.0), ("wildfire", 0.8),
                          ("auto", "auto")):
            params = SolverParams(incremental=True, wildfire_tol=wt,
                                  batch_cliques=False)
            fg = grown(base, params)
            tr = solve_tree(fg)
            # one untimed growth step warms the incremental kernel
            # structures (incl. the one-time wildfire-gate jit compile)
            fg.add_variable(f"x{base+1}", ContinuousScalar)
            fg.add_factor([f"x{base}", f"x{base+1}"],
                          LinearRelative(Normal(10.0, 1.0)))
            tr = solve_tree(fg, old_tree=tr)
            steps = 8
            times = []
            for s in range(steps):
                n = base + 1 + s
                fg.add_variable(f"x{n+1}", ContinuousScalar)
                fg.add_factor([f"x{n}", f"x{n+1}"],
                              LinearRelative(Normal(10.0, 1.0)))
                t0 = time.time()
                tr = solve_tree(fg, old_tree=tr)
                times.append(time.time() - t0)
            med = statistics.median(times)
            medians[(base, label)] = med
            wf = getattr(tr, "wildfire_stats", {})
            print(f"# incremental step chain{base} ({label}): "
                  f"median {med:.3f}s/step "
                  f"(min {min(times):.3f} max {max(times):.3f} n={steps})"
                  f"  gate: {wf.get('down_solves', '?')} down-solves, "
                  f"{wf.get('exact_skips', 0)} exact skips, "
                  f"{wf.get('wildfire_skips', 0)}/"
                  f"{wf.get('stat_syncs', 0)} wildfire skips/syncs",
                  file=sys.stderr)
    # the auto gate must track the better of its two endpoints: within a
    # 1.35x band of reference semantics at BOTH chain lengths (its value
    # is skipping work, never adding more than the one statistic sync)
    for base in (30, 120):
        ref = medians[(base, "reference-semantics")]
        auto = medians[(base, "auto")]
        ok = auto <= ref * 1.35 + 0.005
        print(f"# incremental auto-vs-reference chain{base}: "
              f"{'OK' if ok else 'WARN'} auto {auto:.3f} vs ref {ref:.3f} "
              f"(band 1.35x)", file=sys.stderr)


def extra_se3():
    # SE(3)/SO(3)/Sphere2 reference-tolerance bars on the real chip (the
    # quaternion small-angle + jacfwd f32 paths; warm after first round)
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    import se3_tpu_soak

    rc = se3_tpu_soak.main()
    print(f"# se3 soak: {'PASS' if rc == 0 else 'FAIL'}", file=sys.stderr)
    if rc != 0:
        raise SystemExit(rc)


def extra_multihost():
    # the distribution axis, exercised every round: 2 localhost CPU
    # processes jointly solve an anchored forest (subtree partition +
    # collective exchange); asserts identical posteriors on every process
    from incrementalinference.jl_tpu.parallel.multihost import (
        launch_multihost)

    reps = launch_multihost(2, "anchored_forest", scale=8,
                            devices_per_proc=1, timeout=240)
    errs = [r["warm"]["max_err"] for r in reps]
    assert max(errs) - min(errs) < 1e-6, errs
    t = max(r["warm"]["timings"]["total_s"] for r in reps)
    n = reps[0]["warm"]["n_cliques"]
    print(f"# multihost (2 procs, CPU): {n} cliques, warm {t:.2f}s, "
          f"{n/t:.0f} cliq/s, max err {errs[0]:.3f}", file=sys.stderr)


def extra_pallas():
    # guard the hand-written kernel every round (numerics vs the XLA path
    # + the kernel-only capability regime at 2^32 pairs)
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    import pallas_tpu_check

    rc = pallas_tpu_check.main()
    print(f"# pallas hardware check: {'PASS' if rc == 0 else 'FAIL'}",
          file=sys.stderr)
    if rc != 0:
        raise SystemExit(rc)


def extra_rawcold():
    # raw (unseeded, fresh-cache) cold walls beside the seeded headline
    # (VERDICT r4 item #4): each graph in its own virgin subprocess with a
    # throwaway cache dir so neither the pack nor this process's jit cache
    # can serve it
    here = os.path.dirname(os.path.abspath(__file__))
    for which, tmo in (("linestep20", 420), ("hexagonal", 600)):
        r = subprocess.run(
            [sys.executable, "-u",
             os.path.join(here, "benchmarks", "raw_cold.py"), which],
            capture_output=True, text=True, timeout=tmo)
        out = (r.stdout or "").strip()
        print(out if out else f"# raw cold {which}: FAILED rc={r.returncode}"
              f" {(r.stderr or '')[-300:]}", file=sys.stderr)


EXTRAS = {
    "fourdoor": (extra_fourdoor, 240),
    "hexagonal": (extra_hexagonal, 300),
    "rawcold": (extra_rawcold, 1100),
    "parametric30": (extra_parametric30, 300),
    "cliqrate": (extra_cliqrate, 240),
    "param_cliqrate": (extra_param_cliqrate, 420),
    "incremental": (extra_incremental, 600),
    "pallas": (extra_pallas, 420),
    "se3": (extra_se3, 480),
    "multihost": (extra_multihost, 300),
}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--extra":
        EXTRAS[sys.argv[2]][0]()
        return

    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    cold = run_once(precompile=True)        # compile + run
    print(f"# warmstart: seeded {_SEED_REPORT.get('copied', 0)} entries "
          f"({_SEED_REPORT.get('present', 0)} already present, "
          f"pack {_SEED_REPORT.get('pack_entries', 0)}, version_match="
          f"{_SEED_REPORT.get('version_match')}); persistent-cache "
          f"hits {_CACHE_COUNTS['hits']} / misses {_CACHE_COUNTS['misses']} "
          f"through the cold solve", file=sys.stderr)
    times = [run_once() for _ in range(2)]  # cached-compile solves
    val = min(times)
    _report("linestep20 mmisam solve", cold, val)

    # headline FIRST: the driver must get its JSON line even if the
    # slower extras run into a timeout
    print(json.dumps({
        "metric": "linestep20_mmisam_solve_wall",
        "value": round(val, 3),
        "cold": round(cold, 3),
        "unit": "s",
        "vs_baseline": round(90.0 / max(val, 1e-9), 2),
    }), flush=True)

    # extras in subprocesses: a wedged device->host transfer or a runaway
    # compile only loses that one metric, never the bench
    for name, (_, budget) in EXTRAS.items():
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--extra", name],
                timeout=budget, stderr=subprocess.PIPE, text=True)
            for ln in r.stderr.splitlines():
                if ln.startswith("#"):
                    print(ln, file=sys.stderr)
            if r.returncode != 0:
                print(f"# extra {name}: FAILED rc={r.returncode}",
                      file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# extra {name}: TIMEOUT after {budget}s",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
