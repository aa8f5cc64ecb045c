"""Driver for the Pallas brick tracer: binning, segments, escape fallback.

Orchestrates ops/pallas_trace.run_trace_segment over the full step count:

  1. Rays are binned ONCE at launch with a kd-median partition (split the
     widest bbox axis at the median until tiles hold exactly `rpt` rays).
     Unlike a Morton sort, kd bins are guaranteed spatially tight — curve
     discontinuities made Morton bins span up to half the domain. Binning
     once keeps one global ray permutation for the whole trace, so bulk
     records never need device<->host permutation traffic (the axon tunnel
     moves ~30 MB/s); only small final outputs are un-permuted.
  2. Each segment advances `first_block + (rps-1)*stride` RK4 steps and
     yields `rps` records per ray (positions, cumulative S, Ne/Te/|B|),
     reproducing the reference's record schedule (a record after step i
     whenever i % stride == 0, build_rays.py:241-244).
  3. Rays that out-run their tile's brick (caustic divergence, bin drift)
     are frozen and flagged by the kernel; the driver re-runs exactly those
     rays for the segment on the XLA reference tracer (identical math) and
     merges on the host.
  4. Records are returned in original ray order (order='original', one host
     pass at the end) or in binned order plus the permutation
     (order='binned', for pipelines that keep everything on device and
     un-permute only the final map).

This is the TPU-native replacement for the reference's per-step CUDA kernel
launches (gpu_raytrace.py:383-398): the step loop never leaves the chip, and
LOS field sampling rides along in the same kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .grids import UniformGrid
from .ops.pallas_trace import pack_cube_zc, run_trace_segment
from .ops.trilinear import pack_fields, trilinear_packed
from .tracer import gradient_cubes, init_k_vectors, trace_rays
from .constants import FILL_B, FILL_NE, FILL_TE


class PallasTraceResult(NamedTuple):
    r_record: np.ndarray   # (n_records, n_rays, 3)
    s_record: np.ndarray   # (n_records, n_rays) cumulative S
    ne: np.ndarray         # (n_records, n_rays)
    te: np.ndarray
    b: np.ndarray
    escape_fraction: float
    perm: np.ndarray | None = None   # set when order='binned'


def kd_bin_permutation(pos: np.ndarray, rpt: int) -> np.ndarray:
    """Recursive median partition into spatially tight bins of `rpt` rays.

    pos: (n, 3) host array, n a multiple of rpt (ideally rpt * 2^k so every
    leaf is exactly full). Returns the permutation ordering rays bin-major.
    """
    n = pos.shape[0]
    order = np.arange(n)

    def split(idx):
        if len(idx) <= rpt:
            return [idx]
        p = pos[idx]
        widths = p.max(axis=0) - p.min(axis=0)
        ax = int(np.argmax(widths))
        half = len(idx) // 2
        part = np.argpartition(p[:, ax], half)
        return split(idx[part[:half]]) + split(idx[part[half:]])

    return np.concatenate(split(order))


def trace_rays_pallas(
    omega_pe_cube,
    ne_cube, te_cube, b_cube,
    grid: UniformGrid,
    freq_hz,
    start,                   # (n_rays, 3)
    kdir,                    # (n_rays, 3)
    dt, n_steps, record_stride=10,
    trace_crosssections=True,
    perturb_ratio=2.0,
    rpt=512,
    seg_records=25,
    interpret=False,
    verbose=False,
    order="original",
) -> PallasTraceResult:
    """Trace all rays with the fused Pallas kernel (cumulative-S semantics).

    Records include Ne/Te/|B| sampled at the record positions (making the
    separate LOS sampling pass redundant).
    """
    n_rays = start.shape[0]
    # keep >= 8 tiles and power-of-two padding so kd leaves are exactly full
    eighth = max(1, n_rays // 8)
    rpt = int(min(rpt, max(128, 1 << (eighth.bit_length() - 1))))
    n_tot = rpt
    while n_tot < n_rays:
        n_tot *= 2

    omega_pe_cube = jnp.asarray(omega_pe_cube, jnp.float32)
    gx, gy, gz = gradient_cubes(omega_pe_cube, grid)
    tcube = pack_cube_zc(omega_pe_cube, gx, gy, gz)
    scube = pack_cube_zc(ne_cube, te_cube, b_cube)

    wpe_table = pack_fields(omega_pe_cube)
    k0 = init_k_vectors(wpe_table, grid, freq_hz,
                        jnp.asarray(start, jnp.float32),
                        jnp.asarray(kdir, jnp.float32))

    start_h = np.asarray(start, np.float32)
    pad = n_tot - n_rays
    if pad:
        # dummy rays far outside the cube: frozen, excluded from bboxes;
        # placed at the corner so kd splits park them in edge bins
        start_h = np.concatenate(
            [start_h, np.full((pad, 3), grid.x0 - 1e6, np.float32)])
    perm = kd_bin_permutation(start_h, rpt)
    inv_perm = np.empty_like(perm)
    inv_perm[perm] = np.arange(n_tot)

    state = jnp.concatenate([
        jnp.asarray(start_h[:n_rays]), k0,
        jnp.ones((n_rays, 1), jnp.float32),
        jnp.zeros((n_rays, 1), jnp.float32)], axis=1)
    if pad:
        dummy = jnp.zeros((pad, 8), jnp.float32)
        dummy = dummy.at[:, 0:3].set(grid.x0 - 1e6)
        state = jnp.concatenate([state, dummy], axis=0)
    state = state[jnp.asarray(perm)]
    n_tiles = n_tot // rpt

    n_records = -(-n_steps // record_stride)
    # uniform records-per-segment dividing n_records: each distinct
    # (first_block, rps) pair is a separate Mosaic compile (minutes)
    seg = min(seg_records, n_records)
    while seg > 1 and n_records % seg:
        seg -= 1
    plan = []
    rec_left = n_records
    first = True
    while rec_left > 0:
        rps = min(seg, rec_left)
        plan.append((1 if first else record_stride, rps))
        first = False
        rec_left -= rps

    xla_assets = {}
    blocks = []          # device record blocks, binned order
    total_escaped = 0

    kstate = state.T.reshape(8, n_tiles, rpt).transpose(1, 0, 2)
    for first_block, rps in plan:
        seg_start = kstate
        res = run_trace_segment(
            tcube, scube, kstate, grid, rpt, rps, record_stride,
            first_block, float(dt), float(perturb_ratio),
            trace_crosssections, interpret)
        kstate = res.state
        recs = res.records.transpose(1, 2, 0, 3).reshape(rps, 8, n_tot)

        n_esc = int(np.asarray(jnp.sum(kstate[:, 7, :] > 0.5)))
        if n_esc:
            total_escaped += n_esc
            if verbose:
                print(f"[pallas-trace] segment: {n_esc} escaped rays "
                      f"re-run on XLA path")
            kstate, recs = _rerun_escaped(
                xla_assets, omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                seg_start, kstate, recs, first_block, rps, record_stride,
                dt, perturb_ratio, trace_crosssections, rpt)
        blocks.append(recs)

    recs_all = jnp.concatenate(blocks, axis=0)   # (n_records, 8, n_tot)
    esc_frac = total_escaped / max(1, n_rays * len(plan))

    if order == "device":
        # stay on device: binned order + permutation (pipeline use)
        return recs_all, perm, esc_frac

    rec = np.asarray(recs_all)[:, :, inv_perm][:, :, :n_rays]
    return PallasTraceResult(
        r_record=rec[:, 0:3].transpose(0, 2, 1),
        s_record=rec[:, 3], ne=rec[:, 4], te=rec[:, 5], b=rec[:, 6],
        escape_fraction=esc_frac)


def trace_rays_pallas_device(*args, **kwargs):
    """Device-resident variant: returns (records (n_records, 8, n_tot) jax
    array in kd-binned ray order, perm, escape_fraction). Record rows are
    [x, y, z, S, ne, te, b, pad]. Lets the pipeline keep the whole
    trace -> transfer chain on-chip and un-permute only the final map."""
    return trace_rays_pallas(*args, order="device", **kwargs)


def _rerun_escaped(assets, omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                   seg_start_kstate, kstate, recs, first_block, rps, stride,
                   dt, perturb_ratio, trace_crosssections, rpt):
    """Re-run escaped rays for one segment on the XLA reference tracer and
    merge on the host (escapes are rare with kd binning)."""
    if "trace_table" not in assets:
        from .tracer import pack_trace_table
        assets["trace_table"] = pack_trace_table(omega_pe_cube, grid)
        assets["model_table"] = pack_fields(ne_cube, te_cube, b_cube)

    n_tot = recs.shape[2]
    new_state = np.array(
        jnp.transpose(kstate, (1, 0, 2)).reshape(8, n_tot).T)
    seg_start = np.asarray(
        jnp.transpose(seg_start_kstate, (1, 0, 2)).reshape(8, n_tot).T)
    esc = new_state[:, 7] > 0.5
    idx = np.flatnonzero(esc)
    sub = jnp.asarray(seg_start[idx])
    n_steps_seg = first_block + (rps - 1) * stride

    res = trace_rays(assets["trace_table"], grid, 0.0, sub[:, 0:3],
                     jnp.zeros_like(sub[:, 3:6]), float(dt), n_steps_seg,
                     stride, trace_crosssections, float(perturb_ratio),
                     "cumulative", first_block=first_block,
                     k_init=sub[:, 3:6])
    r_rec, s_rec, final = res.r_record, res.s_record, res.final_state
    s_rec = s_rec * sub[None, :, 6]

    v, _ = trilinear_packed(assets["model_table"], grid,
                            r_rec[..., 0], r_rec[..., 1], r_rec[..., 2])
    fills = jnp.array([FILL_NE, FILL_TE, FILL_B], jnp.float32)
    v = jnp.where(jnp.isfinite(v), v, fills)

    recs = np.array(recs)
    recs[:, 0:3, idx] = np.asarray(r_rec).transpose(0, 2, 1)
    recs[:, 3, idx] = np.asarray(s_rec)
    recs[:, 4:7, idx] = np.asarray(v).transpose(0, 2, 1)

    new_state[idx, 0:3] = np.asarray(final[:, 0:3])
    new_state[idx, 3:6] = np.asarray(final[:, 3:6])
    new_state[idx, 6] = np.asarray(s_rec[-1])
    new_state[:, 7] = 0.0

    n_tiles = n_tot // rpt
    kstate = (jnp.asarray(new_state).T.reshape(8, n_tiles, rpt)
              .transpose(1, 0, 2))
    return kstate, jnp.asarray(recs)
