"""Test harness config: run everything on a virtual 8-device CPU mesh.

The TPU chip (axon tunnel) is reserved for bench.py; unit tests must be
fast and hermetic, so we force the CPU backend and fake 8 devices for the
sharding tests. Must happen before any jax backend initialization.

Tiering: `pytest -m smoke` is the bounded-time tier — modules listed in
_SMOKE_MODULES are auto-marked, chosen so the tier stays green in <=5
minutes from a COLD compile cache (VERDICT r3 #9; the full suite is
compile-bound and can take >1 h cold). Everything else is the full tier.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: recompiling the unrolled bignum graphs
# dominates test wall-time otherwise. Overridable so CI (or a cold-cache
# smoke timing) can point at a fresh dir without losing the warm one.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("KEYHUNT_TEST_CACHE_DIR", "/tmp/jax_cache_keyhunt_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# Modules whose tests avoid the big unrolled-bignum compiles (field/curve
# kernels, engine chunk graphs). Measured cold on this box: see
# docs/PERF.md "test tiers". Keep this list honest — adding a
# compile-heavy module silently blows the 5-minute budget.
_SMOKE_MODULES = {
    "test_core",
    "test_cli",
    "test_dist",
    "test_filter",
    "test_hash",
    "test_legacy",
    "test_native",
}


# Individual slow outliers inside otherwise-fast modules (compile-bound;
# measured cold: build_bitmap_device 46 s)
_SMOKE_EXCLUDE = {"test_build_bitmap_device_matches_host"}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _SMOKE_MODULES
                and item.name not in _SMOKE_EXCLUDE):
            item.add_marker(pytest.mark.smoke)
