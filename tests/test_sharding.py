"""Multi-device sharding: the pipeline partitioned over a virtual 8-CPU mesh
must produce bit-compatible results with the single-device run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracinggrff_tpu.grids import UniformGrid
from raytracinggrff_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from raytracinggrff_tpu.sampler import pack_model_table, sample_model_with_rays
from raytracinggrff_tpu.tracer import pack_trace_table, trace_rays

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _scene(n_rays=64, grid_n=25):
    grid = UniformGrid.cube(2.0, grid_n)
    xs, ys, zs = grid.axes()
    x, y, z = np.meshgrid(xs, ys, zs, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    omega_pe = (1e9 * np.exp(-(r - 1.0) / 0.5)).astype(np.float32)
    rng = np.random.default_rng(0)
    start = np.column_stack([
        rng.uniform(-1.0, 1.0, n_rays), rng.uniform(-1.0, 1.0, n_rays),
        np.full(n_rays, 1.9)]).astype(np.float32)
    kdir = np.tile(np.array([[0, 0, -1]], np.float32), (n_rays, 1))
    return grid, omega_pe, start, kdir


def test_sharded_trace_matches_single_device():
    grid, omega_pe, start, kdir = _scene()
    table = pack_trace_table(jnp.asarray(omega_pe), grid)

    res_single = trace_rays(table, grid, 150e6, jnp.asarray(start),
                            jnp.asarray(kdir), 5e-3, 50, 10,
                            trace_crosssections=True)

    mesh = make_mesh(n_ray_shards=8, n_freq_shards=1)
    start_s = shard_rays(jnp.asarray(start), mesh)
    kdir_s = shard_rays(jnp.asarray(kdir), mesh)
    table_r = replicate(table, mesh)
    res_sharded = trace_rays(table_r, grid, 150e6, start_s, kdir_s,
                             5e-3, 50, 10, trace_crosssections=True)

    np.testing.assert_allclose(np.asarray(res_single.r_record),
                               np.asarray(res_sharded.r_record),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res_single.s_record),
                               np.asarray(res_sharded.s_record),
                               rtol=1e-5, atol=1e-6)
    # output actually sharded over rays
    shard_axes = {s.index[1] for s in res_sharded.r_record.addressable_shards}
    assert len(shard_axes) == 8


def test_mesh_shapes():
    mesh = make_mesh(n_ray_shards=4, n_freq_shards=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("rays", "freq")
    with pytest.raises(ValueError):
        make_mesh(n_ray_shards=3, n_freq_shards=2)


def test_graft_entry_single_and_multichip():
    import importlib.util
    import pathlib
    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))

    mod.dryrun_multichip(8)
