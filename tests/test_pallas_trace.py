"""Pallas brick tracer vs XLA reference tracer (interpret mode on CPU).

The kernel must reproduce trace_rays (cumulative-S semantics) including
frozen-ray behavior, record schedule, and record-time Ne/Te/|B| sampling —
and the escape fallback must make results exact even when a tile's rays
diverge beyond one brick."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracinggrff_tpu.grids import UniformGrid
from raytracinggrff_tpu.sampler import pack_model_table, sample_model_with_rays
from raytracinggrff_tpu.tracer import pack_trace_table, trace_rays
from raytracinggrff_tpu.tracer_pallas import trace_rays_pallas


def _scene(n=41, extent=2.0, freq=80e6):
    grid = UniformGrid.cube(extent, n)
    xs, ys, zs = grid.axes()
    x, y, z = np.meshgrid(xs, ys, zs, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    omega0 = 2 * np.pi * freq
    wpe = (0.9 * omega0 * np.exp(-(r - 1.0) / 0.6)).astype(np.float32)
    wpe[r < 1.0] = 0.9 * omega0
    ne = (1e8 * np.exp(-(r - 1.0) / 0.5)).astype(np.float32)
    te = (1e6 + 1e5 * z).astype(np.float32)
    b = (1.0 + 0.2 * x).astype(np.float32)
    return grid, wpe, ne, te, b


def _bundle(n_rays, cx=0.6, cy=0.0, spread=0.1, z=1.9, seed=0):
    rng = np.random.default_rng(seed)
    start = np.column_stack([
        cx + rng.uniform(-spread, spread, n_rays),
        cy + rng.uniform(-spread, spread, n_rays),
        np.full(n_rays, z)]).astype(np.float32)
    kdir = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (n_rays, 1))
    return start, kdir


def _compare(grid, wpe, ne, te, b, start, kdir, freq, dt, n_steps, stride,
             rpt=128, seg_records=4, max_escape=0.0):
    res_p = trace_rays_pallas(wpe, ne, te, b, grid, freq, start, kdir, dt,
                              n_steps, stride, trace_crosssections=True,
                              rpt=rpt, seg_records=seg_records,
                              interpret=True)
    table = pack_trace_table(jnp.asarray(wpe), grid)
    res_x = trace_rays(table, grid, freq, jnp.asarray(start),
                       jnp.asarray(kdir), dt, n_steps, stride,
                       trace_crosssections=True, s_mode="cumulative")
    np.testing.assert_allclose(res_p.r_record, np.asarray(res_x.r_record),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(res_p.s_record, np.asarray(res_x.s_record),
                               rtol=5e-3, atol=5e-4)
    # Ne/Te/|B| records vs the XLA sampler on the same positions
    mt = pack_model_table(ne, te, b)
    sampled = sample_model_with_rays(mt, grid, res_x.r_record,
                                     res_x.s_record, jnp.asarray(start))
    np.testing.assert_allclose(res_p.ne, np.asarray(sampled.ne),
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(res_p.te, np.asarray(sampled.te),
                               rtol=1e-3, atol=1.0)
    np.testing.assert_allclose(res_p.b, np.asarray(sampled.b),
                               rtol=1e-3, atol=1e-3)
    assert res_p.escape_fraction <= max_escape
    return res_p


def test_refracting_bundle_matches_xla():
    grid, wpe, ne, te, b = _scene()
    start, kdir = _bundle(128)
    _compare(grid, wpe, ne, te, b, start, kdir, 80e6,
             dt=5e-3, n_steps=71, stride=10)


def test_multi_tile_and_padding():
    """3 tiles worth of rays plus padding (n_rays not divisible by rpt)."""
    grid, wpe, ne, te, b = _scene()
    s1, k1 = _bundle(100, cx=0.5, seed=1)
    s2, k2 = _bundle(100, cx=-0.5, cy=0.4, seed=2)
    s3, k3 = _bundle(100, cx=0.0, cy=-0.6, seed=3)
    start = np.concatenate([s1, s2, s3])
    kdir = np.concatenate([k1, k2, k3])
    # 100-ray clusters straddle the 128-ray tiles, so many rays escape their
    # brick — the point here is that the fallback still yields exact results
    _compare(grid, wpe, ne, te, b, start, kdir, 80e6,
             dt=5e-3, n_steps=41, stride=10, rpt=128, max_escape=1.0)


def test_out_of_cube_rays_frozen():
    grid, wpe, ne, te, b = _scene()
    start, kdir = _bundle(128, cx=0.3)
    start[:5, 0] = 50.0   # far outside the cube
    res = _compare(grid, wpe, ne, te, b, start, kdir, 80e6,
                   dt=5e-3, n_steps=31, stride=10)
    # frozen rays never move and their cumulative S collapses to ~0
    np.testing.assert_allclose(res.r_record[:, :5, 0], 50.0)
    assert np.all(res.s_record[-1, :5] < 1e-6)


def test_escape_fallback_two_clusters():
    """Two spatially distant clusters forced into one tile: the brick can't
    cover both, so one cluster escapes and must be recomputed exactly by
    the XLA fallback."""
    grid, wpe, ne, te, b = _scene()
    s1, k1 = _bundle(64, cx=0.9, seed=4)
    s2, k2 = _bundle(64, cx=-0.9, cy=-0.9, seed=5)
    start = np.concatenate([s1, s2])
    kdir = np.concatenate([k1, k2])
    # rpt=128 forces both clusters into a single tile
    _compare(grid, wpe, ne, te, b, start, kdir, 80e6,
             dt=5e-3, n_steps=31, stride=10, rpt=128, max_escape=1.0)


def test_record_schedule_matches_reference():
    """Records land after steps 1, 1+stride, ... (ref build_rays.py:241)."""
    grid, wpe, ne, te, b = _scene()
    # vacuum region ray: straight line, speed C_R
    start = np.tile(np.float32([[1.9, 1.9, 1.9]]), (128, 1))
    kdir = np.tile(np.float32([[-1.0, 0.0, 0.0]]), (128, 1))
    res = trace_rays_pallas(np.zeros_like(wpe), ne, te, b, grid, 80e6,
                            start, kdir, 1e-2, 25, 10, interpret=True)
    from raytracinggrff_tpu.constants import C_R
    for j, steps in enumerate([1, 11, 21]):
        np.testing.assert_allclose(
            res.r_record[j, 0, 0], 1.9 - C_R * 1e-2 * steps, rtol=1e-5)


def test_streamed_packers_match_fused():
    """The bounded-memory y-chunked packers (the 576^3 HBM-OOM fix) must
    reproduce pack_cube_zc + gradient_cubes: interior central differences
    bit-exactly, boundary one-sided differences to float32 rounding (the
    linear edge extrapolation computes (2f1-2f0)/(2h) instead of
    (f1-f0)/h). Odd shapes exercise the clamped-overlap last chunk and
    the 128-lane x padding."""
    from raytracinggrff_tpu.ops.pallas_trace import (
        pack_cube_zc, pack_sample_cube_zc, pack_trace_cube_zc)
    from raytracinggrff_tpu.tracer import gradient_cubes

    rng = np.random.default_rng(7)
    nx, ny, nz = 33, 21, 17            # ny % chunk != 0, nx % 128 != 0
    grid = UniformGrid(x0=-1.0, y0=-1.2, z0=-0.8,
                       dx=0.0625, dy=0.125, dz=0.1, nx=nx, ny=ny, nz=nz)
    wpe = rng.uniform(0.0, 1e9, (nx, ny, nz)).astype(np.float32)
    ref = pack_cube_zc(jnp.asarray(wpe), *gradient_cubes(wpe, grid))
    out = pack_trace_cube_zc(jnp.asarray(wpe), grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=1e-3)

    ne, te, b = (rng.uniform(0, 1e6, (nx, ny, nz)).astype(np.float32)
                 for _ in range(3))
    np.testing.assert_array_equal(
        np.asarray(pack_sample_cube_zc(ne, te, b)),
        np.asarray(pack_cube_zc(ne, te, b)))
    np.testing.assert_array_equal(
        np.asarray(pack_sample_cube_zc(ne, te, b, b, ne, te, nch=8)),
        np.asarray(pack_cube_zc(ne, te, b, b, ne, te, nch=8)))
