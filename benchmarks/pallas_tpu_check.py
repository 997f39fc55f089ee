"""Hardware check: compiled Pallas row-logsumexp kernel vs plain XLA on the
real TPU (run manually — requires a healthy device->host transfer path,
which the tunneled axon chip does not always provide; see BASELINE.md
"axon runtime caveats").

Checks, in order:
1. execution: compiled kernel dispatches and completes at every shape
   (catches the round-1 "hangs at small dims" claim — which bisected to
   the tunnel transfer path, not the kernel);
2. numerics: max relative row-logsumexp error vs the XLA fused path;
3. capability: the XLA path fails at Na*Nb >= 2^32 (65536^2) while the
   kernel keeps working — the reason LARGE_PAIR_THRESHOLD exists.

Usage: python benchmarks/pallas_tpu_check.py
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


def main():
    print(f"# device: {jax.devices()[0]}")
    worst = 0.0
    for n, dof in ((1000, 1), (1024, 2), (5000, 3), (8192, 6), (33000, 3)):
        muA = jax.random.normal(jax.random.PRNGKey(0), (n, dof)) * 3
        muB = jax.random.normal(jax.random.PRNGKey(1), (n, dof))
        precA = jnp.abs(jax.random.normal(jax.random.PRNGKey(2),
                                          (n, dof))) + 0.5
        precB = jnp.abs(jax.random.normal(jax.random.PRNGKey(3),
                                          (n, dof))) + 0.5
        t0 = time.time()
        a = pair_row_logsumexp(muA, precA, muB, precB)
        jax.block_until_ready(a)
        b = xla_row_lse(muA, precA, muB, precB)
        scale = jnp.maximum(jnp.max(jnp.abs(b)), 1.0)
        err = float(jnp.max(jnp.abs(a - b)) / scale)   # device->host read
        worst = max(worst, err)
        print(f"n={n:6d} dof={dof}: rel err {err:.2e} "
              f"({time.time() - t0:.2f}s)")
    # capability: kernel-only regime
    n = 65536
    muA = jax.random.normal(jax.random.PRNGKey(0), (n, 3))
    precA = jnp.ones((n, 3))
    t0 = time.time()
    out = pair_row_logsumexp(muA, precA, muA + 0.5, precA)
    jax.block_until_ready(out)
    print(f"n={n} (beyond XLA's 2^32 limit): kernel ran "
          f"({time.time() - t0:.2f}s)")
    ok = worst < 1e-4
    print(f"{'PASS' if ok else 'FAIL'}: worst rel err {worst:.2e}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
