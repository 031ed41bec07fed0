"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated on host platform devices
(``xla_force_host_platform_device_count=8``); the real TPU chip is only used
by bench.py / the driver, never by the unit tests.

Note: the environment pre-sets ``jax_platforms='axon,cpu'`` (TPU tunnel), which
overrides the JAX_PLATFORMS env var — force CPU via jax.config instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: cold-JIT dominates suite runtime otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/mfl_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8
