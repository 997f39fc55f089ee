"""Test config: run on a virtual 8-device CPU mesh (no TPU needed in CI).

Multi-chip sharding paths are exercised against
``--xla_force_host_platform_device_count=8`` per the project driver contract.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # override the session's axon/TPU pin
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# persistent compile cache: repeated test runs skip XLA recompilation
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
