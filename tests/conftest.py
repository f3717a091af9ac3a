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

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the big jitted frame programs recompile only
# when code/shapes change, not on every suite run
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
