"""Test harness config: run everything on a virtual 8-device CPU mesh.

The TPU chip (axon tunnel) is reserved for bench.py; unit tests must be
fast and hermetic, so we force the CPU backend and fake 8 devices for the
sharding tests. Must happen before any jax backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: recompiling the unrolled bignum graphs
# dominates test wall-time otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_keyhunt_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402,F401
