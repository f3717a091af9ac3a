"""svtav1_tpu: TPU-native AV1 encoder (JAX/XLA device compute + native C
entropy backend).

Importing the package enables JAX's persistent compilation cache: the device
frame pipeline compiles a handful of large programs (decide, commit
wavefront, filters) whose first-compile cost would otherwise be paid every
process start (the reference amortizes the analogous cost at build time).
"""
import os as _os

try:  # best-effort: never block import on cache setup
    import jax as _jax

    _cache = _os.environ.get(
        "SVTAV1_TPU_JAX_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "svtav1_tpu_jax"))
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass
