"""raytracinggrff_tpu — TPU-native solar radio imaging framework.

Capabilities of peijin94/raytracingGRFF rebuilt JAX/XLA-first: refractive ray
tracing through MAS coronal models, LOS sampling, and native GRFF
gyroresonance/free-free radiative transfer, fused into jitted device graphs
and sharded over TPU meshes.

Public API mirrors the reference package exports
(raytracingGRFF/__init__.py:1-15) plus the framework-native entry points.
"""

import os as _os
import sys as _sys


def _default_compile_cache():
    """Default JAX's persistent compilation cache to an on-disk location.

    The production TbSpectra sweep compiles a distinct kernel/driver stack
    per (stride, plan, cube-shape) combination; without the on-disk cache
    every run re-pays minutes of XLA/Mosaic compile. Runs BEFORE the
    jax-importing submodule imports below so the env default is seen at
    jax import; `setdefault` never overrides a user-set value, and if jax
    was imported first the config route is used (again only when unset).
    """
    path = _os.path.join(_os.path.expanduser("~"), ".cache",
                         "raytracinggrff_tpu", "jax_comp_cache")
    try:
        _os.makedirs(path, exist_ok=True)
    except OSError:
        return  # read-only home: run without the cache
    fresh = "JAX_COMPILATION_CACHE_DIR" not in _os.environ
    _os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    _os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                           "1.0")
    if fresh and "jax" in _sys.modules:
        import jax
        try:
            if jax.config.jax_compilation_cache_dir is None:
                jax.config.update("jax_compilation_cache_dir", path)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
        except AttributeError:
            pass


_default_compile_cache()

from .constants import C_R, R_SUN_CM, R_SUN_M
from .coords import cart_to_sph, sph_to_cart, image_xyz_to_mas_sph
from .grids import UniformGrid, variable_z_grid, linear_z_grid
from .tracer import (TraceResult, trace_rays, trace_rays_from_cube,
                     pack_trace_table)
from .tracer_pallas import (PallasTraceResult, trace_rays_pallas,
                            iter_trace_segments, iter_tail_traces)
from .sampler import (LosSamples, sample_model_with_rays,
                      sample_model_with_rays_arrays, pack_model_table)
from .grff import get_mw, get_mw_slice, grff_transfer, tb_from_sfu
from .mas import MASModel, MASVariable, synthetic_mas_model
from .mas.model import load_mas_var, resample_var_to_cube
from .pipeline import (RayEmissionConfig, run_ray_tracing_emission,
                       resample_mas_los, synthetic_ff, prepare_cubes)
from .utils import patch_nan_emission_map

# Reference-compatible aliases (raytracingGRFF/__init__.py exports and the
# legacy names kept at gpu_raytrace.py:762-780)
ray_trace = trace_rays_from_cube
trace_ray = trace_rays_from_cube
load_mas_var_filtered = load_mas_var
resample_to_xyz_cube = resample_var_to_cube
trace_los_cpu = sample_model_with_rays_arrays
trace_los_gpu = sample_model_with_rays_arrays
trace_los_gpu_cupy = sample_model_with_rays_arrays
trace_los_dispatch = sample_model_with_rays_arrays
ray_trace_gpu = trace_rays_from_cube

__all__ = [
    "C_R", "R_SUN_CM", "R_SUN_M",
    "cart_to_sph", "sph_to_cart", "image_xyz_to_mas_sph",
    "UniformGrid", "variable_z_grid", "linear_z_grid",
    "TraceResult", "trace_rays", "trace_rays_from_cube", "pack_trace_table",
    "PallasTraceResult", "trace_rays_pallas", "iter_trace_segments",
    "iter_tail_traces",
    "LosSamples", "sample_model_with_rays", "sample_model_with_rays_arrays",
    "pack_model_table",
    "get_mw", "get_mw_slice", "grff_transfer", "tb_from_sfu",
    "MASModel", "MASVariable", "synthetic_mas_model", "load_mas_var",
    "resample_var_to_cube",
    "RayEmissionConfig", "run_ray_tracing_emission", "resample_mas_los",
    "synthetic_ff", "prepare_cubes",
    "patch_nan_emission_map",
    "ray_trace", "trace_ray", "load_mas_var_filtered", "resample_to_xyz_cube",
]

__version__ = "0.1.0"
