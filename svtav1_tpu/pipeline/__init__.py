import os

# persistent compilation cache: OPT-IN via SVTAV1_TPU_JAX_CACHE (the
# package __init__ handles it); default off — executable reload SIGSEGVs
# on this deployment's hosts (see tests/conftest.py).
_cache_dir = os.environ.get("SVTAV1_TPU_JAX_CACHE")
if _cache_dir:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without the option
        pass
