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


def test_limb_concentrated_shard_balance():
    """SPMD load balance under a pathological ray distribution: all active
    rays cluster at one limb of the image plane. The kd capacity binner
    packs occupied tiles as a spatially-clustered prefix, so WITHOUT the
    round-robin tile placement every occupied tile would land in shard 0's
    contiguous slot range (straggler factor ~ n_shards = 8); the driver's
    interleave must keep per-shard occupied-lane-steps balanced. Numeric
    parity with the unsharded run must hold through the permutation."""
    from raytracinggrff_tpu.tracer_pallas import iter_trace_segments

    n = 25
    grid = UniformGrid.cube(2.5, n)
    xs, ys, zs = grid.axes()
    x, y, z = np.meshgrid(xs, ys, zs, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    wpe = (0.5 * 2 * np.pi * 80e6 * np.exp(-(r - 1) / 0.6)).astype(
        np.float32)
    ne = (1e8 * np.exp(-(r - 1) / 0.5)).astype(np.float32)
    te = np.full_like(ne, 1e6)
    b = np.ones_like(ne)
    rng = np.random.default_rng(3)
    n_rays = 64
    # limb-concentrated: a tight arc near (x, y) = (1, 0)
    start = np.column_stack([
        rng.uniform(0.9, 1.0, n_rays), rng.uniform(-0.05, 0.05, n_rays),
        np.full(n_rays, 1.9)]).astype(np.float32)
    kdir = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n_rays, 1))

    def run(mesh):
        stats = {}
        recs_all = []
        for recs in iter_trace_segments(
                wpe, ne, te, b, grid, 80e6, start, kdir, 1e-2, 41, 10,
                rpt=8, seg_records=2, stats=stats, interpret=True,
                mesh=mesh):
            recs_all.append(np.asarray(recs))
        return np.concatenate(recs_all, axis=0), stats

    mesh = make_mesh(n_ray_shards=8, n_freq_shards=1)
    recs_m, stats_m = run(mesh)
    recs_1, _ = run(None)

    assert "straggler_factor" in stats_m
    ls = np.asarray(stats_m["shard_lane_steps"])
    assert ls.sum() > 0
    # balanced to within the one-tile quantum; 1.3x is the VERDICT bound
    assert stats_m["straggler_factor"] <= 1.3, (
        stats_m["straggler_factor"], ls.tolist())
    # the work actually spreads: most shards carry occupied tiles
    assert int((ls > 0).sum()) >= 6, ls.tolist()
    np.testing.assert_allclose(recs_m[:, 0:4, :n_rays],
                               recs_1[:, 0:4, :n_rays],
                               rtol=1e-5, atol=1e-5)


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
