"""Shipped warm-start compilation cache.

The fresh-machine cold-start cost is XLA compilation of the core solver
programs (BASELINE.md "Cold-compile wall"; the reference pays the
analogous cost in Julia precompilation, src/IncrementalInference.jl:242-249
— but per installation, not per machine).  This module ships the compiled
program set of the canonical LineStep(20) and hexagonal-SE2 solves
(~30 MB, `aotcache/tpu-v5e/`) and copies it into the active persistent
compilation cache, so a new environment's first solve loads executables
instead of compiling them.

Safety: jax persistent-cache entries are content-addressed by program,
jaxlib version, backend and compile options — a mismatching entry is
simply never looked up (a cache MISS, not an error), so seeding is a
no-op on other accelerator types or jax versions.  (This is unlike
XLA:CPU AOT executables, which can abort on machine-feature mismatch —
the shipped pack is TPU-only for that reason; see tests/conftest.py.)
"""

from __future__ import annotations

import os
import shutil

__all__ = ["seed_cache"]

_PACKS = {"tpu": "tpu-v5e"}


def seed_cache(dest: str | None = None, backend: str = "tpu") -> int:
    """Copy the shipped compiled-program pack into the persistent
    compilation cache directory (``dest`` or jax's configured
    ``jax_compilation_cache_dir``).  Existing entries are kept.  Returns
    the number of entries copied; 0 when there is nothing applicable
    (no cache dir configured, unknown backend pack, or all present)."""
    pack = _PACKS.get(backend)
    if pack is None:
        return 0
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "aotcache", pack)
    if not os.path.isdir(src):
        return 0
    if dest is None:
        import jax

        dest = getattr(jax.config, "jax_compilation_cache_dir", None)
    if not dest:
        return 0
    os.makedirs(dest, exist_ok=True)
    n = 0
    for name in os.listdir(src):
        d = os.path.join(dest, name)
        if not os.path.exists(d):
            shutil.copyfile(os.path.join(src, name), d)
            n += 1
    return n
