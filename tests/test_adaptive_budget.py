"""Adaptive tile-budget sizing and the sweep's shared-compilation lattice.

Sparse-ray workloads (few pixels over a wide FOV) need more capacity
leaves than the static tile_factor budget allows; before the launch-state
probe (tracer_pallas.iter_trace_segments) the binner stuffed the
un-splittable remainder capacity-blind and a 32^2 TbSpectra frame measured
95% tail-out. These tests pin the probe (zero escapes on a sparse bundle
the static budget cannot hold) and the tb_spectra preset lattice.
"""

import numpy as np
import pytest

from raytracinggrff_tpu.cli.tb_spectra import quantize_params, select_params
from raytracinggrff_tpu.grids import UniformGrid
from raytracinggrff_tpu.tracer_pallas import trace_rays_pallas


def test_sparse_wide_fov_does_not_tail_out():
    """1024 rays spread over a 7 R_sun face of a 96^3 cube with a small
    (32, 8, 8) brick need ~50 capacity leaves; the static budget
    (max(tile_factor*n_rays, 32 tiles) = 32 tiles at rpt=128) cannot hold
    them, so without the probe most rays are stuffed capacity-blind and
    escape on their first step."""
    n = 96
    grid = UniformGrid.cube(4.0, n)
    wpe = np.zeros((n, n, n), np.float32)   # vacuum: straight rays
    ne = np.full((n, n, n), 1e7, np.float32)
    te = np.full((n, n, n), 1e6, np.float32)
    b = np.ones((n, n, n), np.float32)

    side = 32
    g = np.linspace(-3.5, 3.5, side, dtype=np.float32)
    gx, gy = np.meshgrid(g, g, indexing="ij")
    start = np.column_stack([gx.ravel(), gy.ravel(),
                             np.full(side * side, 3.5, np.float32)])
    kdir = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32),
                   (side * side, 1))

    res = trace_rays_pallas(wpe, ne, te, b, grid, 100e6, start, kdir,
                            1e-3, 4, 2, trace_crosssections=True,
                            rpt=128, seg_records=1, interpret=True,
                            brick=(32, 8, 8))
    # straight vacuum rays never leave their (adequately sized) bricks
    assert res.escape_fraction == 0.0
    # every record position is finite and exactly on the launch verticals
    assert np.isfinite(res.r_record).all()
    np.testing.assert_allclose(res.r_record[-1, :, 0], start[:, 0],
                               atol=1e-5)


def test_quantize_params_lattice():
    seen_grids, seen_cubes, seen_variants = set(), set(), set()
    for f in np.logspace(np.log10(30.0), np.log10(800.0), 30) * 1e6:
        p = select_params(float(f))
        q = quantize_params(p)
        # only ever grants MORE resolution / steps / records
        assert q["grid_n"] >= p["grid_n"]
        assert q["n_steps"] >= p["n_steps"]
        assert q["grid_extent"] >= p["grid_extent"]
        # cell size never coarser than the preset's
        assert (2 * q["grid_extent"] / q["grid_n"]
                <= 2 * p["grid_extent"] / p["grid_n"] + 1e-12)
        assert q["grid_n"] % 64 == 0
        assert (q["grid_extent"] / 0.25) % 1.0 == 0.0
        # stride rounds DOWN onto powers of two: denser records, never
        # sparser
        s = q["record_stride"]
        assert s <= p["record_stride"] and (s & (s - 1)) == 0
        # whole number of full segments: one kernel variant per stride
        assert q["n_steps"] % (s * 25) == 0
        seen_grids.add(q["grid_n"])
        seen_cubes.add((q["grid_n"], q["grid_extent"]))
        seen_variants.add((q["grid_n"], s))
    # the lattice actually shares shapes/compiles across the production
    # sweep (the raw presets need 15 cubes and 19 kernel variants)
    assert len(seen_grids) <= 5
    assert len(seen_cubes) <= 10
    assert len(seen_variants) <= 8
