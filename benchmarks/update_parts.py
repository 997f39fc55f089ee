"""Micro-breakdown of one fused variable update's components on TPU.

Each component is repeated K times INSIDE one jitted lax.scan (output fed
back as input), so the measured wall divided by K is true device time per
execution — immune to the axon tunnel's per-dispatch latency, which
otherwise floors any external timing loop at ~0.5 ms/call."""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

K = 100


def timed(name, body, x0):
    """body: x -> x (same shape/dtype); K reps inside one program."""
    def loop(x):
        def step(c, k):
            return body(c, k), None
        out, _ = jax.lax.scan(step, x, jax.random.split(
            jax.random.PRNGKey(9), K))
        return out
    f = jax.jit(loop)
    out = f(x0)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])   # drain
    t0 = time.time()
    out = f(x0)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    w = (time.time() - t0) / K
    print(f"# {name:44s} {w*1e6:9.1f} us/exec", flush=True)
    return w


def main(N):
    from incrementalinference.jl_tpu.beliefs import loo_bandwidth
    from incrementalinference.jl_tpu.manifolds import Euclidean
    from incrementalinference.jl_tpu.models.factors import LinearRelative
    from incrementalinference.jl_tpu.distributions import Normal
    from incrementalinference.jl_tpu.ops.convolve import (ConvSpec,
                                                          eval_factor_core)
    from incrementalinference.jl_tpu.ops.fused import _make_update
    from incrementalinference.jl_tpu.ops.product import (
        condense_mixture, pair_product_tangent, CONDENSE_K)

    man = Euclidean(1)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (N, 1))
    y = x + 1.0
    model = LinearRelative(Normal(1.0, 0.1))
    spec_cf = ConvSpec(False, 1, 2, None, None, 0.0, 3, 1, 0.0, 3.0, 1e-6,
                       linear=True)
    spec_old = ConvSpec(False, 1, 2, None, None, 0.0, 3, 3, 5.0, 3.0, 1e-6,
                        linear=False)
    print(f"# N={N}", flush=True)

    timed("conv linear closed-form (1 cyc)",
          lambda p, k: eval_factor_core(man, model, k, (p, p + 1.0),
                                        spec_cf), x)
    timed("conv looped GN (3 cyc x 3 it)",
          lambda p, k: eval_factor_core(man, model, k, (p, p + 1.0),
                                        spec_old), x)
    timed("loo_bandwidth",
          lambda p, k: p + loo_bandwidth(man, p)[None, :], x)

    prec = jnp.ones_like(x) * 25.0
    timed("pair_product exact NxN",
          lambda m, k: pair_product_tangent(m, prec, y, prec, k, N)[0], x)
    if N >= 768:
        timed("condense_mixture",
              lambda m, k: condense_mixture(
                  m, prec, k, k=min(CONDENSE_K, N))[0].sum() + m, x)

    # full update via the production path: 1 grouped pair of linear convs
    upd = _make_update(man, (spec_cf, spec_cf), ((True,), (True,)), N)
    timed("fused update: 2 grouped linear convs + product",
          lambda p, k: upd((model, model), ((p, p + 1.0), (p, p + 1.0)),
                           p, k)[0], x)
    upd1 = _make_update(man, (spec_cf,), ((True,),), N)
    timed("fused update: 1 conv (D=1 fast path)",
          lambda p, k: upd1((model,), ((p, p + 1.0),), p, k)[0], x)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100)
