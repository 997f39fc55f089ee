"""Raw (no warm-start pack, fresh compile cache) cold-wall measurement
(VERDICT r4 item #4): first-ever build+init+solve of a canonical graph in
a virgin process with a throwaway persistent-cache dir.

Usage: python benchmarks/raw_cold.py [linestep20|hexagonal]
"""
import os
import shutil
import sys
import tempfile
import time

import jax

_cache = tempfile.mkdtemp(prefix="jaxcache-rawcold-")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(which: str) -> None:
    from incrementalinference.jl_tpu import solve_tree

    t0 = time.time()
    if which == "hexagonal":
        from incrementalinference.jl_tpu.canonical import generate_hexagonal
        fg = generate_hexagonal()
    else:
        from incrementalinference.jl_tpu.canonical import generate_line_step
        fg = generate_line_step(20, graphinit=True)
    t_build = time.time() - t0
    t1 = time.time()
    solve_tree(fg, precompile=True)
    jax.block_until_ready([fg.points(v) for v in fg.ls()])
    t_solve = time.time() - t1
    print(f"# raw cold {which}: total {t_build + t_solve:.1f}s "
          f"(build+init {t_build:.1f}s, solve {t_solve:.1f}s) "
          f"[virgin cache, no pack]", flush=True)
    shutil.rmtree(_cache, ignore_errors=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "linestep20")
