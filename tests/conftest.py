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

import pytest  # noqa: E402,F401
