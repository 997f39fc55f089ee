"""End-to-end solve whose belief products exceed LARGE_PAIR_THRESHOLD —
the Pallas streaming kernel runs inside a real tree solve, not just the
standalone check (VERDICT r2 item 4b).

Graph: prior + relative + prior over two 1-D variables at N=50,000
particles.  Every belief product at a variable with two proposals is then
a 50k x 50k pair product (2.5e9 pairs > 2^30 threshold) routed through
``pair_product_tangent_large`` -> ``pair_row_logsumexp`` (Pallas), with
the chunked block selection keeping peak memory ~BLOCK*N.

Usage: python benchmarks/pallas_e2e_solve.py
"""
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

from incrementalinference.jl_tpu import (ContinuousScalar,  # noqa: E402
                                         LinearRelative, Normal, Prior,
                                         SolverParams, initfg, solve_tree)
from incrementalinference.jl_tpu.ops import product  # noqa: E402


def main():
    print(f"# device: {jax.devices()[0]}")
    N = 50_000
    assert N * N >= product.LARGE_PAIR_THRESHOLD, \
        "fixture no longer exceeds the large-pair threshold"
    params = SolverParams(N=N, batch_cliques=False)
    fg = initfg(params)
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 1.0)))
    fg.add_factor(["x1"], Prior(Normal(10.0, 1.0)))

    t0 = time.time()
    solve_tree(fg)
    walls = [time.time() - t0]
    # posterior reads force device completion of the whole pipeline
    stats = {}
    for v, mu_true in (("x0", 0.0), ("x1", 10.0)):
        pts = np.asarray(fg.points(v))[:, 0]
        stats[v] = (float(pts.mean()), float(pts.std()))
        # prior (sigma=1) fused with relative evidence: mean within a few
        # hundredths at N=50k; generous bar for the tunnel fixture
        assert abs(stats[v][0] - mu_true) < 0.2, (v, stats[v])
        assert 0.4 < stats[v][1] < 1.5, (v, stats[v])
    t0 = time.time()
    solve_tree(fg)
    np.asarray(fg.points("x1"))
    walls.append(time.time() - t0)
    print(f"# N={N} e2e solve through the Pallas large-pair path: "
          f"cold {walls[0]:.1f}s / warm {walls[1]:.2f}s; "
          f"posteriors {stats}")
    print("PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
