"""The streamed Pallas pipeline (trace segments -> transfer carry on device)
must produce the same T_b map as the XLA record-based pipeline."""

import numpy as np
import pytest

from raytracinggrff_tpu.grids import UniformGrid
from raytracinggrff_tpu.pipeline import (RayEmissionConfig,
                                         run_ray_tracing_emission)


@pytest.fixture(scope="module")
def cubes():
    grid = UniformGrid.cube(2.5, 40)
    xs, ys, zs = grid.axes()
    x, y, z = np.meshgrid(xs, ys, zs, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    ne = np.where(r >= 1.0, 4.2e4 * 10 ** (4.32 / np.maximum(r, 0.9)),
                  0.0).astype(np.float32)
    import jax.numpy as jnp
    omega_pe = jnp.asarray(8.93e3 * np.sqrt(ne) * 2 * np.pi)
    return {
        "omega_pe": omega_pe,
        "ne": jnp.asarray(ne),
        "te": jnp.asarray(np.full_like(ne, 1.4e6)),
        "b": jnp.asarray((2.0 / np.maximum(r, 0.9) ** 3).astype(np.float32)),
    }


def test_streamed_matches_xla_pipeline(cubes):
    common = dict(n_pix=8, x_fov=1.3, freq_hz=150e6, grid_n=40,
                  grid_extent=2.5, z_observer=2.5, dt=1e-2, n_steps=610,
                  record_stride=10, nfreq=2, freq_log_step=0.2,
                  s_input_on=True)
    r_xla = run_ray_tracing_emission(
        cubes=cubes, verbose=False,
        config=RayEmissionConfig(tracer_backend="xla", **common))
    r_pal = run_ray_tracing_emission(
        cubes=cubes, verbose=False,
        config=RayEmissionConfig(tracer_backend="pallas",
                                 pallas_interpret=True, seg_records=20,
                                 **common))
    a = r_xla["emission_cube"]
    b = r_pal["emission_cube"]
    lit = (a > 1e4) & (b > 1e4)
    assert lit.sum() > 20
    np.testing.assert_allclose(b[lit], a[lit], rtol=5e-3)
    np.testing.assert_allclose(
        r_pal["emission_polVI_cube"][lit], r_xla["emission_polVI_cube"][lit],
        atol=1e-4)


def test_streamed_sharded_matches_single_device(cubes):
    """The production (streamed Pallas) path under an 8-device mesh must
    reproduce the single-device map: ray tiles shard over 'rays' via
    shard_map, the transfer carry shards over (rays, freq)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from raytracinggrff_tpu.parallel.mesh import make_mesh

    common = dict(n_pix=8, x_fov=1.3, freq_hz=150e6, grid_n=40,
                  grid_extent=2.5, z_observer=2.5, dt=1e-2, n_steps=310,
                  record_stride=10, nfreq=2, freq_log_step=0.2)
    cfg = RayEmissionConfig(tracer_backend="pallas", pallas_interpret=True,
                            seg_records=10, **common)
    r_one = run_ray_tracing_emission(cubes=cubes, verbose=False, config=cfg)
    mesh = make_mesh(n_ray_shards=4, n_freq_shards=2)
    r_mesh = run_ray_tracing_emission(cubes=cubes, verbose=False,
                                      config=cfg, mesh=mesh)
    np.testing.assert_allclose(r_mesh["emission_cube"],
                               r_one["emission_cube"], rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(r_mesh["emission_polVI_cube"],
                               r_one["emission_polVI_cube"], atol=1e-5)
