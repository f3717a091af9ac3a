import os

import jax

# persistent compilation cache: encoder programs are per-resolution; cache
# them across processes (first 1080p compile is ~minutes on the tunnel TPU)
_cache_dir = os.environ.get("SVTAV1_TPU_JAX_CACHE", os.path.expanduser("~/.cache/svtav1_tpu_jax"))
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the option
    pass
