"""Measure the XLA-fused vs Pallas-kernel crossover for the pair-product
row-logsumexp (VERDICT r2 item 4a): both paths timed at Na*Nb from 2^26 up
to the XLA capability cliff at 2^32, dof=3.

Timing methodology on the axon tunnel: ``block_until_ready`` ACKs on
dispatch, so each timed run ends with a scalar device->host read of the
result (forces completion; adds the ~tens-of-ms tunnel round-trip floor to
BOTH paths equally).  min of ``reps`` runs.

Usage: python benchmarks/pallas_crossover.py
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
# keep XLA per-fusion cache paths OUT of the compile options: they embed
# the cache DIRECTORY PATH into every cache key, so entries only ever hit
# from the exact same directory (bisected 2026-08-21: a copied cache got
# ZERO hits until this was disabled; with it, 42/42 hits and 53s -> 13s)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

from incrementalinference.jl_tpu.ops.kernels.pallas_product import (  # noqa: E402
    pair_row_logsumexp)
from incrementalinference.jl_tpu.ops.product import _pair_logW  # noqa: E402


@jax.jit
def xla_row_lse(muA, precA, muB, precB):
    return jax.scipy.special.logsumexp(
        _pair_logW(muA, precA, muB, precB), axis=-1)


def timed(fn, args, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        _ = float(out[0])          # force completion via scalar read
        best = min(best, time.time() - t0)
    return best


def main():
    print(f"# device: {jax.devices()[0]}")
    dof = 3
    rows = []
    for n in (8192, 16384, 24576, 32768, 49152, 57344):
        k = jax.random.PRNGKey(0)
        ka, kb, kp, kq = jax.random.split(k, 4)
        muA = jax.random.normal(ka, (n, dof)) * 3
        muB = jax.random.normal(kb, (n, dof))
        precA = jnp.abs(jax.random.normal(kp, (n, dof))) + 0.5
        precB = jnp.broadcast_to(
            jnp.abs(jax.random.normal(kq, (1, dof))) + 0.5, (n, dof))
        args = (muA, precA, muB, precB)
        # warm both compiles before timing
        float(xla_row_lse(*args)[0])
        float(pair_row_logsumexp(*args)[0])
        t_xla = timed(xla_row_lse, args)
        t_pal = timed(pair_row_logsumexp, args)
        pairs = n * n
        rows.append((n, pairs, t_xla, t_pal))
        print(f"n={n:6d} pairs=2^{pairs.bit_length()-1:<3d} "
              f"xla {t_xla*1e3:8.1f}ms   pallas {t_pal*1e3:8.1f}ms   "
              f"ratio {t_pal/max(t_xla,1e-9):5.2f}", flush=True)
    # capability cliff: XLA compile-fails at 65536^2 (2^32); kernel-only
    n = 65536
    muA = jax.random.normal(jax.random.PRNGKey(0), (n, dof))
    precA = jnp.ones((n, dof))
    args = (muA, precA, muA + 0.5, precA)
    float(pair_row_logsumexp(*args)[0])
    t_pal = timed(pair_row_logsumexp, args)
    print(f"n={n} (XLA cannot compile): pallas {t_pal*1e3:.1f}ms")
    crossover = next((p for _, p, tx, tp in rows if tp < tx), None)
    print(f"# first pair count where pallas beats xla: {crossover}")


if __name__ == "__main__":
    main()
