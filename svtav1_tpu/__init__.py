"""svtav1_tpu: TPU-native AV1 encoder (JAX/XLA device compute + native C
entropy backend).

The persistent JAX compilation cache is OPT-IN via SVTAV1_TPU_JAX_CACHE:
on this deployment's hosts, reloading a persisted CPU executable can
SIGSEGV inside compilation_cache.get_executable_and_time (cpu_aot_loader
machine-feature mismatch), so no cache dir is set by default.
"""
import os as _os

try:  # best-effort: never block import on cache setup
    _cache = _os.environ.get("SVTAV1_TPU_JAX_CACHE")
    if _cache:
        import jax as _jax

        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass
