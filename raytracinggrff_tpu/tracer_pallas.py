"""Driver for the Pallas brick tracer: binning, segments, escape fallback.

Orchestrates ops/pallas_trace.run_trace_segment over the full step count:

  1. Before each segment, rays are re-binned with a kd-median partition
     (split the widest bbox axis at the median until tiles hold exactly
     `rpt` rays). kd bins are guaranteed spatially tight — Morton-curve
     discontinuities put rays from opposite sides of the domain into one
     bin (measured 40%+ brick-escape rates); refraction spreads bins apart
     over time, so binning once at launch is not enough either.
  2. Each segment advances `first_block + (rps-1)*stride` RK4 steps and
     yields `rps` records per ray (positions, cumulative S, Ne/Te/|B|),
     reproducing the reference's record schedule (a record after step i
     whenever i % stride == 0, build_rays.py:241-244).
  3. Rays that still out-run their tile's brick (caustic divergence) are
     frozen and flagged by the kernel; the driver re-runs exactly those
     rays for the segment on the XLA reference tracer (identical math) and
     merges. Escape subsets are padded to power-of-two buckets so the
     fallback compiles O(log n) distinct shapes, not one per segment.
  4. Consumers choose how records flow:
       * iter_trace_segments — the streaming interface: yields per-segment
         device records in that segment's bin order plus the permutation;
         the pipeline chains them straight into the radiative-transfer
         carry without bulk records ever crossing the ~30 MB/s
         device<->host tunnel (see pipeline.run_ray_tracing_emission).
       * trace_rays_pallas — assembles host records in original ray order
         (tests, benchmark, reference-shaped API).

This is the TPU-native replacement for the reference's per-step CUDA kernel
launches (gpu_raytrace.py:383-398): the step loop never leaves the chip, and
LOS field sampling rides along in the same kernel.

Round-2 optimization targets (measured on the canonical 75 MHz workload):
~23% of rays end up as chaotic post-reflection grazing fans too sparse for
any fixed-count spatial binning; they fall back to the XLA path every
segment and dominate end-to-end time (fallback fixed costs, not ray-step
math). Plan: (a) one-shot fixed-horizon XLA traces for the stable cohort
instead of per-segment re-runs; (b) masked split transfer updates so
fallback records feed the streaming consumer directly without the
records round-trip through the ~30 MB/s tunnel (device column scatters
of that size currently crash the axon TPU worker); (c) a sparse-ray
kernel variant (per-ray neighborhood DMA) if (a)+(b) are not enough.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

import functools

from .grids import UniformGrid
from .ops.pallas_trace import pack_cube_zc, run_trace_segment
from .ops.trilinear import pack_fields, trilinear_packed
from .tracer import gradient_cubes, init_k_vectors, trace_rays
from .constants import FILL_B, FILL_NE, FILL_TE


@functools.partial(jax.jit, static_argnames=("grid",))
def _prepare_trace_inputs(omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                          start, kdir, freq_hz):
    """One jitted setup graph: gradient cubes, fused-layout packing, kc0
    init. (Eager per-op dispatch through the TPU tunnel costs seconds per
    op; this was ~2.5 min of setup when run eagerly.)"""
    gx, gy, gz = gradient_cubes(omega_pe_cube, grid)
    tcube = pack_cube_zc(omega_pe_cube, gx, gy, gz)
    scube = pack_cube_zc(ne_cube, te_cube, b_cube)
    wpe_table = pack_fields(omega_pe_cube)
    k0 = init_k_vectors(wpe_table, grid, freq_hz, start, kdir)
    return tcube, scube, k0


class PallasTraceResult(NamedTuple):
    r_record: np.ndarray   # (n_records, n_rays, 3)
    s_record: np.ndarray   # (n_records, n_rays) cumulative S
    ne: np.ndarray         # (n_records, n_rays)
    te: np.ndarray
    b: np.ndarray
    escape_fraction: float


def kd_bin_permutation(pos: np.ndarray, rpt: int,
                       capacity=(1.0, 1.0, 1.0)) -> np.ndarray:
    """Recursive median partition into spatially tight bins of `rpt` rays.

    pos: (n, 3) host array with n = rpt * 2^k so every leaf is exactly
    full. Splits the axis with the largest width/capacity ratio, so leaves
    respect anisotropic brick extents (the x-window is narrower than the
    y/z brick). Returns the permutation ordering rays bin-major."""
    cap = np.asarray(capacity, np.float64)

    def split(idx):
        if len(idx) <= rpt:
            return [idx]
        p = pos[idx]
        widths = (p.max(axis=0) - p.min(axis=0)) / cap
        ax = int(np.argmax(widths))
        half = len(idx) // 2
        part = np.argpartition(p[:, ax], half)
        return split(idx[part[:half]]) + split(idx[part[half:]])

    return np.concatenate(split(np.arange(pos.shape[0])))


def _segment_plan(n_steps, record_stride, seg_records):
    n_records = -(-n_steps // record_stride)
    # chunk into seg_records-sized segments (+ a smaller last one): at most
    # 3 distinct (first_block, rps) kernel variants get Mosaic-compiled
    seg = min(seg_records, n_records)
    plan = []
    rec_left = n_records
    first = True
    while rec_left > 0:
        rps = min(seg, rec_left)
        plan.append((1 if first else record_stride, rps))
        first = False
        rec_left -= rps
    return plan, n_records


def iter_trace_segments(
    omega_pe_cube, ne_cube, te_cube, b_cube,
    grid: UniformGrid, freq_hz,
    start, kdir, dt, n_steps, record_stride=10,
    trace_crosssections=True, perturb_ratio=2.0,
    rpt=512, seg_records=25, interpret=False, verbose=False,
    stats=None,
):
    """Generator yielding (records, perm) per segment.

    records: (rps, 8, n_tot) jax array, rows [x,y,z,S,ne,te,b,pad], rays in
    this segment's kd-bin order. perm: (n_tot,) host permutation such that
    records[:, :, i] belongs to original ray perm[i]. n_tot pads n_rays to
    rpt * 2^k with frozen dummy rays. `stats` (optional dict) accumulates
    'escaped' counts.
    """
    n_rays = start.shape[0]
    # keep >= ~32 tiles so small images still bin tightly (a 64^2 image
    # with 512-ray tiles measured 67% brick escapes; 128-ray tiles bin
    # ~2x tighter per axis), floor 128 for MXU/VPU lane efficiency
    per32 = max(1, n_rays // 32)
    rpt = int(min(rpt, max(128, 1 << (per32.bit_length() - 1))))
    n_tot = rpt
    while n_tot < n_rays:
        n_tot *= 2
    n_tiles = n_tot // rpt

    omega_pe_cube = jnp.asarray(omega_pe_cube, jnp.float32)
    tcube, scube, k0 = _prepare_trace_inputs(
        omega_pe_cube, jnp.asarray(ne_cube, jnp.float32),
        jnp.asarray(te_cube, jnp.float32), jnp.asarray(b_cube, jnp.float32),
        grid, jnp.asarray(start, jnp.float32),
        jnp.asarray(kdir, jnp.float32), jnp.float32(freq_hz))

    state_h = np.zeros((n_tot, 8), np.float32)
    state_h[:, 0] = grid.x0 - 1e6    # dummy padding: frozen outside cube
    state_h[:n_rays, 0:3] = np.asarray(start, np.float32)
    state_h[:n_rays, 3:6] = np.asarray(k0)
    state_h[:, 6] = 1.0
    state = jnp.asarray(state_h)

    plan, _ = _segment_plan(n_steps, record_stride, seg_records)
    xla_assets = {}
    if stats is None:
        stats = {}
    stats.setdefault("escaped", 0)

    # state stays in the current segment's bin order; global_perm maps
    # current row -> original ray index (composed across segments)
    from .ops.pallas_trace import BX, BY, BZ
    # kd capacity in R_sun per axis: usable brick extents minus margins
    capacity = np.array([(BX - 2) * grid.dx, (BY - 2) * grid.dy,
                         (BZ - 2) * grid.dz])
    bounds_lo = np.array(grid.origin, np.float32)
    bounds_hi = bounds_lo + np.array(
        [(grid.nx - 1) * grid.dx, (grid.ny - 1) * grid.dy,
         (grid.nz - 1) * grid.dz], np.float32)

    def bin_rays(pos_h, cohort):
        """kd-bin rays by position. Dead (out-of-cube) rays and the XLA
        cohort are parked in trailing bins so they don't inflate living
        bins' bboxes. Returns None when the current binning still fits the
        bricks comfortably (skips the re-permute entirely).

        Note: binning on predicted segment-midpoint positions was tried and
        is WORSE — the kernel re-centers bricks on instantaneous bboxes, so
        the current span is what matters."""
        alive = np.all((pos_h >= bounds_lo) & (pos_h <= bounds_hi), axis=1)
        park = ~alive | cohort
        key = np.where(park[:, None], pos_h * 0 + (bounds_hi + 1e3), pos_h)
        bins = key.reshape(n_tiles, rpt, 3)
        spans = bins.max(axis=1) - bins.min(axis=1)
        dead_bin = np.all(bins[:, :, 0] > bounds_hi[0], axis=1)
        if np.all((spans <= 0.7 * capacity) | dead_bin[:, None]):
            return None
        return kd_bin_permutation(key, rpt, capacity=capacity)

    # Rays that escape their brick join a persistent "XLA cohort": they are
    # pre-frozen for the kernel (so living bins stay tight) and integrated
    # by the XLA fallback every segment. Membership is re-tested every few
    # segments — chaotic caustic rays often re-join coherent flows later.
    cohort = np.zeros(n_tot, bool)
    global_perm = np.arange(n_tot)
    for seg_i, (first_block, rps) in enumerate(plan):
        if seg_i % 4 == 3:
            cohort[:] = False    # periodic retry on the fast path
        pos_h = np.asarray(state[:, 0:3])
        local = bin_rays(pos_h, cohort)
        if local is not None:
            global_perm = global_perm[local]
            state = state[jnp.asarray(local)]
            cohort = cohort[local]
        kstate = state.T.reshape(8, n_tiles, rpt).transpose(1, 0, 2)
        seg_start = kstate
        if cohort.any():
            pre = (jnp.asarray(cohort.astype(np.float32))
                   .reshape(n_tiles, rpt))
            kstate = kstate.at[:, 7, :].set(pre)

        res = run_trace_segment(
            tcube, scube, kstate, grid, rpt, rps, record_stride,
            first_block, float(dt), float(perturb_ratio),
            trace_crosssections, interpret)
        kstate = res.state
        recs = res.records.transpose(1, 2, 0, 3).reshape(rps, 8, n_tot)

        esc_h = np.asarray(kstate[:, 7, :]).reshape(n_tot) > 0.5
        n_esc = int(esc_h.sum())
        if n_esc:
            stats["escaped"] += n_esc
            if verbose:
                print(f"[pallas-trace] segment: {n_esc} escaped/cohort rays "
                      f"re-run on XLA path")
            kstate, recs = _rerun_escaped(
                xla_assets, omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                seg_start, kstate, recs, esc_h, first_block, rps,
                record_stride, dt, perturb_ratio, trace_crosssections, rpt)
            cohort = cohort | esc_h

        state = jnp.transpose(kstate, (1, 0, 2)).reshape(8, n_tot).T
        state = state.at[:, 7].set(0.0)
        yield recs, global_perm


def trace_rays_pallas(
    omega_pe_cube, ne_cube, te_cube, b_cube,
    grid: UniformGrid, freq_hz,
    start, kdir, dt, n_steps, record_stride=10,
    trace_crosssections=True, perturb_ratio=2.0,
    rpt=512, seg_records=25, interpret=False, verbose=False,
) -> PallasTraceResult:
    """Trace all rays with the fused Pallas kernel (cumulative-S semantics),
    assembling records on the host in original ray order. Records include
    Ne/Te/|B| sampled at the record positions."""
    n_rays = start.shape[0]
    _, n_records = _segment_plan(n_steps, record_stride, seg_records)
    stats = {}
    rec_host = None
    rec_base = 0
    n_seg = 0
    for recs, perm in iter_trace_segments(
            omega_pe_cube, ne_cube, te_cube, b_cube, grid, freq_hz,
            start, kdir, dt, n_steps, record_stride, trace_crosssections,
            perturb_ratio, rpt, seg_records, interpret, verbose, stats):
        n_seg += 1
        rps = recs.shape[0]
        if rec_host is None:
            rec_host = np.zeros((n_records, perm.shape[0], 8), np.float32)
        rec_host[rec_base:rec_base + rps, perm, :] = (
            np.asarray(recs).transpose(0, 2, 1))
        rec_base += rps

    rec_host = rec_host[:, :n_rays, :]
    return PallasTraceResult(
        r_record=rec_host[:, :, 0:3],
        s_record=rec_host[:, :, 3],
        ne=rec_host[:, :, 4],
        te=rec_host[:, :, 5],
        b=rec_host[:, :, 6],
        escape_fraction=stats["escaped"] / max(1, n_rays * n_seg),
    )


def _rerun_escaped(assets, omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                   seg_start_kstate, kstate, recs, esc_h, first_block, rps,
                   stride, dt, perturb_ratio, trace_crosssections, rpt):
    """Re-run escaped rays for one segment on the XLA reference tracer and
    merge on the host. Subsets are padded to power-of-two buckets so the
    fallback compiles a bounded number of shapes."""
    if "trace_table" not in assets:
        from .tracer import pack_trace_table
        assets["trace_table"] = pack_trace_table(omega_pe_cube, grid)
        assets["model_table"] = pack_fields(ne_cube, te_cube, b_cube)

    n_tot = recs.shape[2]
    seg_start = np.asarray(
        jnp.transpose(seg_start_kstate, (1, 0, 2)).reshape(8, n_tot).T)
    idx_all = np.flatnonzero(esc_h)
    n_steps_seg = first_block + (rps - 1) * stride

    # fixed bucket sizes {2048, 16384}, larger counts processed in 16384
    # chunks: the XLA fallback compiles exactly two shapes per process
    # (each compile costs ~30s through the remote compiler)
    def run_chunk(idx):
        """Trace one escape chunk on the XLA path; stays on device."""
        m = len(idx)
        bucket = 2048 if m <= 2048 else 16384
        idx_pad = np.concatenate([idx, np.full(bucket - m, idx[0])])
        sub = jnp.asarray(seg_start[idx_pad])
        res = trace_rays(assets["trace_table"], grid, 0.0, sub[:, 0:3],
                         jnp.zeros_like(sub[:, 3:6]), float(dt),
                         n_steps_seg, stride, trace_crosssections,
                         float(perturb_ratio), "cumulative",
                         first_block=first_block, k_init=sub[:, 3:6])
        r_rec = res.r_record[:, :m]
        s_rec = res.s_record[:, :m] * jnp.asarray(seg_start[idx, 6])[None, :]
        final = res.final_state[:m]
        v, _ = trilinear_packed(assets["model_table"], grid,
                                r_rec[..., 0], r_rec[..., 1], r_rec[..., 2])
        fills = jnp.array([FILL_NE, FILL_TE, FILL_B], jnp.float32)
        v = jnp.where(jnp.isfinite(v), v, fills)
        return r_rec, s_rec, final, v

    parts = [run_chunk(idx_all[i:i + 16384])
             for i in range(0, len(idx_all), 16384)]
    idx = idx_all
    # host-side merge: device-side column scatters of this size reliably
    # crash the axon TPU worker ("kernel fault"), so the merge pays the
    # tunnel transfer instead
    r_rec = np.concatenate([np.asarray(p[0]) for p in parts], axis=1)
    s_rec = np.concatenate([np.asarray(p[1]) for p in parts], axis=1)
    final = np.concatenate([np.asarray(p[2]) for p in parts], axis=0)
    v = np.concatenate([np.asarray(p[3]) for p in parts], axis=1)

    recs = np.array(recs)
    recs[:, 0:3, idx] = r_rec.transpose(0, 2, 1)
    recs[:, 3, idx] = s_rec
    recs[:, 4:7, idx] = v.transpose(0, 2, 1)

    new_state = np.array(
        jnp.transpose(kstate, (1, 0, 2)).reshape(8, n_tot).T)
    new_state[idx, 0:3] = final[:, 0:3]
    new_state[idx, 3:6] = final[:, 3:6]
    new_state[idx, 6] = s_rec[-1]
    new_state[:, 7] = 0.0

    n_tiles = n_tot // rpt
    kstate = (jnp.asarray(new_state).T.reshape(8, n_tiles, rpt)
              .transpose(1, 0, 2))
    return kstate, jnp.asarray(recs)
