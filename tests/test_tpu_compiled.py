"""Compiled (Mosaic) Pallas kernel parity on real TPU hardware.

Every other Pallas test runs the kernel in interpret mode on CPU, which
exercises the kernel's math but not Mosaic's lowering — a Mosaic-only
miscompile would ship silently (the benchmark only checks one scalar for
finiteness). This test runs the ACTUAL compiled kernel on the chip and
compares full records against the XLA reference tracer, plus one streamed
end-to-end map. Run with:

    RTGRFF_TPU_TESTS=1 python -m pytest tests/test_tpu_compiled.py -q

Scenes are kept tiny (33^3 cube, 256 rays, ~50 steps) so the one kernel
variant compiles in minutes, not hours.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from raytracinggrff_tpu.grids import UniformGrid
from raytracinggrff_tpu.tracer import pack_trace_table, trace_rays
from raytracinggrff_tpu.tracer_pallas import trace_rays_pallas

pytestmark = pytest.mark.tpu


def _scene(n=33, extent=2.0, freq=80e6):
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


def test_compiled_kernel_matches_xla():
    grid, wpe, ne, te, b = _scene()
    rng = np.random.default_rng(0)
    start = np.column_stack([
        0.6 + rng.uniform(-0.1, 0.1, 256),
        rng.uniform(-0.1, 0.1, 256),
        np.full(256, 1.9)]).astype(np.float32)
    kdir = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (256, 1))

    res_p = trace_rays_pallas(wpe, ne, te, b, grid, 80e6, start, kdir,
                              5e-3, 51, 10, trace_crosssections=True,
                              rpt=128, seg_records=6, interpret=False)
    table = pack_trace_table(jnp.asarray(wpe), grid)
    res_x = trace_rays(table, grid, 80e6, jnp.asarray(start),
                       jnp.asarray(kdir), 5e-3, 51, 10,
                       trace_crosssections=True, s_mode="cumulative")
    np.testing.assert_allclose(res_p.r_record, np.asarray(res_x.r_record),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(res_p.s_record, np.asarray(res_x.s_record),
                               rtol=5e-3, atol=5e-4)
    assert np.isfinite(res_p.ne).all() and np.isfinite(res_p.te).all()
