"""The reference's PkgBenchmark suite, runnable here.

Mirrors benchmark/benchmarks.jl of IncrementalInference.jl: parametric
{1-init, 2-solve, 3-grow} and mmisam {2-solve, 3-grow} on the hexagonal
SE(2) graph (generateGraph_Hexagonal; `landmark=True` is the "grow"
variant), 2 samples each with the reference's 90 s-per-sample budget as
the comparison anchor (the reference publishes no absolute numbers —
BASELINE.md).

Run: ``python benchmarks/benchmarks.py`` → one JSON line per benchmark
(best-of-samples wall seconds, after one untimed warmup that absorbs XLA
compilation, like the reference's JIT-excluding setup).
"""

import json
import sys
import time

SAMPLES = 2
REFERENCE_BUDGET_S = 90.0   # benchmark/runbenchmarks.jl per-sample budget


def _bench(name, setup, run, samples=SAMPLES):
    fg = setup()
    run(fg)                       # warmup: XLA compile + cache
    times = []
    for _ in range(samples):
        fg = setup()
        t0 = time.time()
        run(fg)
        times.append(time.time() - t0)
    best = min(times)
    print(json.dumps({
        "benchmark": name,
        "value": round(best, 4),
        "unit": "s",
        "samples": samples,
        "vs_reference_budget": round(REFERENCE_BUDGET_S / max(best, 1e-9), 1),
    }), flush=True)
    return best


def suite():
    from incrementalinference.jl_tpu import solve_graph
    from incrementalinference.jl_tpu.canonical import generate_hexagonal
    from incrementalinference.jl_tpu.parametric import (autoinit_parametric,
                                                        solve_graph_parametric)

    _bench("parametric/1-init/hex",
           lambda: generate_hexagonal(graphinit=False, landmark=False),
           autoinit_parametric)
    _bench("parametric/2-solve/hex",
           lambda: generate_hexagonal(graphinit=False, landmark=False),
           solve_graph_parametric)
    _bench("parametric/3-grow/hex",
           lambda: generate_hexagonal(graphinit=False, landmark=True),
           solve_graph_parametric)
    _bench("mmisam/2-solve/hex",
           lambda: generate_hexagonal(graphinit=True, landmark=False),
           solve_graph)
    _bench("mmisam/3-grow/hex",
           lambda: generate_hexagonal(graphinit=True, landmark=True),
           solve_graph)


if __name__ == "__main__":
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
    # keep XLA per-fusion cache paths OUT of the compile options: they
    # embed the cache DIRECTORY PATH into every key, so entries only hit
    # from the same directory (bisected 2026-08-21)
    jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    suite()
