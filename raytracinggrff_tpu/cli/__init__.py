"""CLI entry points.

Importing this package enables JAX's persistent compilation cache for every
CLI: the production TbSpectra sweep compiles a distinct kernel/driver stack
per frequency preset (dt, n_steps, record_stride are static kernel args), so
without the on-disk cache a 30-frequency sweep pays ~1-2 min of XLA/Mosaic
compile per frequency on EVERY run; with it, re-runs and resumed sweeps
(--start-from-idx) skip straight to execution. Honors a user-set
JAX_COMPILATION_CACHE_DIR; only fills in a default when unset.
"""

import os


def _enable_compile_cache():
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user already configured it; jax reads the env var itself
    import jax

    path = os.path.join(os.path.expanduser("~"), ".cache",
                        "raytracinggrff_tpu", "jax_comp_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (OSError, AttributeError):
        pass  # read-only home or older jax: run without the cache


_enable_compile_cache()
