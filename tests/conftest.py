"""Test config: run on a virtual 8-device CPU mesh (no TPU needed in CI).

Multi-chip sharding paths are exercised against
``--xla_force_host_platform_device_count=8`` per the project driver contract.

NOTE: this image half-imports jax at interpreter startup and pins
``JAX_PLATFORMS=axon`` in the env, so plain env mutation is ignored — the
platform must be forced through ``jax.config`` (see .claude/skills/verify).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: repeated test runs skip XLA recompilation
# dedicated dir: executables compiled by axon-coupled processes abort
# here (machine-feature mismatch) — never share caches across configs
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-pytest")
# keep only the jit-level cache: XLA:CPU AOT entries are machine-feature
# sensitive and poison across process configurations (SIGILL risk)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# XLA:CPU segfaults (deep in LoadedExecutable.serialize) when writing the
# large scan-bearing whole-clique chain kernels to the persistent cache —
# skip persistent WRITES for those programs only (they recompile per test
# process; everything else stays cached). TPU executables serialize fine.
import jax._src.compilation_cache as _cc  # noqa: E402

_orig_put_executable = _cc.put_executable_and_time


def _safe_put_executable(cache_key, module_name, executable, backend,
                         compile_time):
    if "clique_chain" in module_name:
        return
    return _orig_put_executable(cache_key, module_name, executable, backend,
                                compile_time)


_cc.put_executable_and_time = _safe_put_executable


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
