"""Test config: run on a virtual 8-device CPU mesh (no TPU needed in CI).

Multi-chip sharding paths are exercised against
``--xla_force_host_platform_device_count=8`` per the project driver contract.

NOTE: this image half-imports jax at interpreter startup and pins
``JAX_PLATFORMS=axon`` in the env, so plain env mutation is ignored — the
platform must be forced through ``jax.config`` (see .claude/skills/verify).

## Why full-suite runs shard into per-file subprocesses

XLA:CPU segfaults (inside LLVM ``backend_compile_and_load``, occasionally
inside executable serialization) once a single process has JIT-compiled
enough programs — the crash point moves with the test set, consistent with
cumulative JITted-code volume crossing a code-model displacement limit
rather than any specific program being bad (bisected 2026-08-19: the
pre-session suite passes cold; adding ~20 tests makes later compiles
segfault at varying sites).  ``pytest tests/`` therefore re-dispatches each
test FILE into its own subprocess, capping per-process compile volume, and
retries a crashed child (the persistent jit cache makes retries converge:
entries written before a crash are reused).  Single-file invocations run
inline as usual.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: repeated test runs and crash-retry children
# skip XLA recompilation.  Dedicated dir: executables compiled by
# axon-coupled processes abort here (machine-feature mismatch) — never
# share caches across configs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("IITPU_PYTEST_CACHE_DIR",
                                 "/tmp/jaxcache-pytest"))
# keep only the jit-level cache: XLA:CPU AOT entries are machine-feature
# sensitive and poison across process configurations (SIGILL risk)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

_SHARD_CHILD_ENV = "IITPU_SHARDED_CHILD"


def _is_full_suite_invocation(args, testdir):
    targets = [a for a in args if not a.startswith("-")]
    if not targets:
        return True
    for t in targets:
        p = os.path.abspath(t.rstrip("/"))
        if p != testdir and not os.path.isdir(p):
            return False
    return True


def pytest_cmdline_main(config):
    """Shard full-suite runs into one subprocess per test file (see module
    docstring).  Children and explicit single-file runs return None and
    proceed normally."""
    if os.environ.get(_SHARD_CHILD_ENV) == "1":
        return None
    if os.environ.get("IITPU_NO_SHARD") == "1":
        return None
    args = list(config.invocation_params.args)
    testdir = os.path.dirname(os.path.abspath(__file__))
    if not _is_full_suite_invocation(args, testdir):
        return None

    import glob
    import re
    import subprocess
    import sys
    import time

    files = sorted(glob.glob(os.path.join(testdir, "test_*.py")))
    flags_ = [a for a in args if a.startswith("-") and a not in ("-q", "-x")]
    stop_on_fail = "-x" in args
    env = dict(os.environ)
    env[_SHARD_CHILD_ENV] = "1"

    t0 = time.time()
    totals = {"passed": 0, "failed": 0, "skipped": 0}
    failed_files = []
    for path in files:
        name = os.path.basename(path)
        for attempt in range(3):
            run_env = env
            if attempt == 2:
                # the retry-convergence assumption (shared jit cache makes
                # the third run cheap) breaks when the cache dir holds
                # POISONED entries (e.g. written by an axon-coupled
                # process with different machine features — they fail to
                # load, force recompiles, and re-trip the XLA:CPU
                # code-volume abort).  Last attempt: a private fresh
                # cache dir for this child.
                import tempfile
                run_env = dict(env)
                run_env["IITPU_PYTEST_CACHE_DIR"] = tempfile.mkdtemp(
                    prefix="jaxcache-retry-")
            r = subprocess.run(
                [sys.executable, "-m", "pytest", path, "-q", *flags_],
                env=run_env, capture_output=True, text=True)
            tail = (r.stdout or "")[-4000:]
            counts = {v: int(k) for k, v in
                      re.findall(r"(\d+) (passed|failed|skipped|errors?)",
                                 tail)}
            if r.returncode == 0:
                for k in totals:
                    totals[k] += counts.get(k, 0)
                print(f"{name}: {counts.get('passed', 0)} passed"
                      + (f", {counts['skipped']} skipped"
                         if counts.get("skipped") else ""),
                      flush=True)
                break
            crashed = r.returncode < 0 or r.returncode >= 128 or \
                "Fatal Python error" in (r.stderr or "")
            if crashed and attempt < 2:
                print(f"{name}: child crashed (rc={r.returncode}), "
                      f"retry {attempt + 1}", flush=True)
                continue
            # genuine test failure (or persistent crash)
            failed_files.append(name)
            totals["passed"] += counts.get("passed", 0)
            totals["failed"] += max(counts.get("failed", 0), 1)
            print(f"{name}: FAILED (rc={r.returncode})", flush=True)
            sys.stdout.write(tail + "\n")
            sys.stdout.write((r.stderr or "")[-2000:] + "\n")
            break
        if failed_files and stop_on_fail:
            break

    dt = time.time() - t0
    status = "FAILED" if failed_files else "passed"
    print(f"[sharded suite] {totals['passed']} passed, "
          f"{totals['failed']} failed, {totals['skipped']} skipped "
          f"across {len(files)} files in {dt:.1f}s — {status}", flush=True)
    return 1 if failed_files else 0


def pytest_collection_modifyitems(config, items):
    """Test-group gating à la the reference's IIF_TEST_GROUP env variable
    (test/runtests.jl:3): IITPU_TEST_GROUP=basic_functional_group |
    test_cases_group runs a subset; unset runs everything."""
    group = os.environ.get("IITPU_TEST_GROUP")
    if not group:
        return
    basic = {"test_manifolds", "test_distributions", "test_product",
             "test_convolve", "test_tree", "test_native", "test_graph",
             "test_serialization", "test_debugging", "test_pallas_kernels",
             "test_init_order", "test_manual_init"}
    cases = {"test_solve", "test_parametric", "test_multihypo_tree",
             "test_manifold_solves", "test_model_families", "test_multichip",
             "test_deconv_gradients", "test_extensions",
             "test_solvekey_wildfire", "test_fused_chain"}
    keep = basic if group == "basic_functional_group" else cases
    import pytest as _pytest
    skip = _pytest.mark.skip(reason=f"not in {group}")
    for item in items:
        mod = item.module.__name__.split(".")[-1]
        if mod not in keep:
            item.add_marker(skip)
