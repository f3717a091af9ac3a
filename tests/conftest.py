"""Test config: force the CPU backend with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware (mirrors the
reference's lp1-vs-lpN determinism strategy, Docs/CommonQuestions.md:139).

Note: the environment pins JAX_PLATFORMS=axon via sitecustomize, so the env
var alone is not enough — we override the jax config directly before any
backend initializes. This also keeps the suite independent of TPU-tunnel
availability."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NO persistent compile cache for the suite: this jaxlib's CPU executable
# deserialization is broken on this host — reloading an entry (even one
# written moments earlier by the same process) SIGSEGVs inside
# compilation_cache.get_executable_and_time, with cpu_aot_loader warning
# about mismatched compile-machine features first (the serializer targets
# a wider feature set than the host). In-memory jit caching still applies;
# opt back in explicitly with JAX_COMPILATION_CACHE_DIR if a future jaxlib
# fixes the loader.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# ---------------------------------------------------------------- test tiers
# e2e/compile-heavy modules are marked slow so `pytest -m "not slow"` is a
# fast smoke tier (reference analog: unit vs E2E gtest binary split,
# test/Readme.md). Module-level marking keeps the opt-out in one place.
_SLOW_MODULES = {
    "test_e2e_intra", "test_e2e_inter", "test_hierarchical",
    "test_cdf_inheritance", "test_inter_device", "test_tpl_crf",
    "test_rdoq", "test_restoration", "test_multichip", "test_10bit",
    "test_device_path_quality", "test_intra_batch", "test_filter_intra",
    "test_dims", "test_mctf", "test_vbr", "test_compound", "test_multiref",
    "test_determinism", "test_twopass",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
