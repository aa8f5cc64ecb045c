"""Driver for the Pallas brick tracer: binning, segments, escape fallback.

Orchestrates ops/pallas_trace.run_trace_segment over the full step count:

  1. Rays are Morton-sorted by position into tiles of `rpt` before each
     segment, so each tile's rays stay inside one VMEM brick.
  2. Each segment advances `first_block + (rps-1)*stride` RK4 steps and
     yields `rps` records per ray (positions, cumulative S, Ne/Te/|B|),
     reproducing the reference's record schedule (a record after step
     i whenever i % stride == 0, build_rays.py:241-244).
  3. Rays that out-run their tile's brick (caustic divergence) are frozen
     and flagged by the kernel; the driver re-runs exactly those rays for
     the segment on the XLA reference tracer (identical math) and merges.
  4. Records are assembled on the host in original ray order.

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
from .ops.pallas_trace import (morton_keys, pack_cube_zc, run_trace_segment)
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


def _sorted_state(state, keys):
    perm = jnp.argsort(keys)
    return state[perm], perm


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
    rpt=128,
    seg_records=16,
    interpret=False,
    verbose=False,
) -> PallasTraceResult:
    """Trace all rays with the fused Pallas kernel (cumulative-S semantics).

    Returns records in original ray order, including Ne/Te/|B| sampled at
    the record positions (making the separate LOS sampling pass redundant).
    """
    # big tiles amortize per-tile-step latency, but a tile larger than the
    # ray population spans the whole image and escapes constantly: keep at
    # least ~8 tiles (power-of-two rpt, floor 128)
    eighth = max(1, int(start.shape[0]) // 8)
    rpt = int(min(rpt, max(128, 1 << (eighth.bit_length() - 1))))
    omega_pe_cube = jnp.asarray(omega_pe_cube, jnp.float32)
    gx, gy, gz = gradient_cubes(omega_pe_cube, grid)
    tcube = pack_cube_zc(omega_pe_cube, gx, gy, gz)
    scube = pack_cube_zc(ne_cube, te_cube, b_cube)

    wpe_table = pack_fields(omega_pe_cube)
    k0 = init_k_vectors(wpe_table, grid, freq_hz,
                        jnp.asarray(start, jnp.float32),
                        jnp.asarray(kdir, jnp.float32))

    n_rays = start.shape[0]
    n_pad = (-n_rays) % rpt
    state = jnp.concatenate([
        jnp.asarray(start, jnp.float32), k0,
        jnp.ones((n_rays, 1), jnp.float32),
        jnp.zeros((n_rays, 1), jnp.float32)], axis=1)   # (n, 8)
    if n_pad:
        # dummy rays far outside the cube: frozen, excluded from bboxes
        dummy = jnp.zeros((n_pad, 8), jnp.float32)
        dummy = dummy.at[:, 0:3].set(grid.x0 - 1e6)
        state = jnp.concatenate([state, dummy], axis=0)
    n_tot = state.shape[0]
    n_tiles = n_tot // rpt

    n_records = -(-n_steps // record_stride)
    # Prefer a uniform records-per-segment that divides n_records: each
    # distinct (first_block, rps) pair is a separate Mosaic kernel compile
    # (minutes via the remote compiler), so uniform segments cost 2 compiles.
    seg = min(seg_records, n_records)
    while seg > 1 and n_records % seg:
        seg -= 1
    # segment plan: (first_block, rps) — record 0 comes after a single step
    plan = []
    rec_left = n_records
    first = True
    while rec_left > 0:
        rps = min(seg, rec_left)
        plan.append((1 if first else record_stride, rps))
        first = False
        rec_left -= rps

    # XLA fallback assets, built lazily on first escape
    xla_assets = {}

    rec_host = np.zeros((n_records, n_tot, 8), np.float32)
    rec_base = 0
    total_escaped = 0

    for first_block, rps in plan:
        keys = morton_keys(state[:, 0:3], grid)
        state_sorted, perm = _sorted_state(state, keys)
        seg_start_state = state_sorted
        kstate = state_sorted.T.reshape(8, n_tiles, rpt).transpose(1, 0, 2)

        res = run_trace_segment(
            tcube, scube, kstate, grid, rpt, rps, record_stride,
            first_block, float(dt), float(perturb_ratio),
            trace_crosssections, interpret)

        new_state = res.state.transpose(1, 0, 2).reshape(8, n_tot).T
        recs = res.records.transpose(1, 2, 0, 3).reshape(rps, 8, n_tot)

        esc = np.asarray(new_state[:, 7]) > 0.5
        n_esc = int(esc.sum())
        if n_esc:
            total_escaped += n_esc
            if verbose:
                print(f"[pallas-trace] segment: {n_esc} escaped rays "
                      f"re-run on XLA path")
            new_state, recs = _rerun_escaped(
                xla_assets, omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                freq_hz, seg_start_state, new_state, recs, esc,
                first_block, rps, record_stride, dt, perturb_ratio,
                trace_crosssections)

        # host assembly in original ray order
        inv = np.asarray(perm)
        recs_np = np.asarray(recs)               # (rps, 8, n_tot) sorted order
        rec_host[rec_base:rec_base + rps, inv, :] = (
            recs_np.transpose(0, 2, 1))
        # carry state back in original order
        state = jnp.zeros_like(state).at[perm].set(new_state)
        # clear escape flags for the next segment
        state = state.at[:, 7].set(0.0)
        rec_base += rps

    rec_host = rec_host[:, :n_rays, :]
    return PallasTraceResult(
        r_record=rec_host[:, :, 0:3],
        s_record=rec_host[:, :, 3],
        ne=rec_host[:, :, 4],
        te=rec_host[:, :, 5],
        b=rec_host[:, :, 6],
        escape_fraction=total_escaped / max(1, n_rays * len(plan)),
    )


def _rerun_escaped(assets, omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                   freq_hz, seg_start_state, new_state, recs, esc,
                   first_block, rps, stride, dt, perturb_ratio,
                   trace_crosssections):
    """Re-run escaped rays for one segment on the XLA reference tracer."""
    if "trace_table" not in assets:
        from .tracer import pack_trace_table
        assets["trace_table"] = pack_trace_table(omega_pe_cube, grid)
        assets["model_table"] = pack_fields(ne_cube, te_cube, b_cube)

    idx = np.flatnonzero(esc)
    sub = jnp.asarray(np.asarray(seg_start_state)[idx])   # (m, 8)
    n_steps_seg = first_block + (rps - 1) * stride

    r_rec, s_rec, final = _xla_segment(
        assets["trace_table"], grid, sub[:, 0:3], sub[:, 3:6],
        float(dt), n_steps_seg, stride, first_block,
        trace_crosssections, float(perturb_ratio))
    # cumulative S continues from the segment-start value
    s_rec = s_rec * sub[None, :, 6]

    v, _ = trilinear_packed(assets["model_table"], grid,
                            r_rec[..., 0], r_rec[..., 1], r_rec[..., 2])
    fills = jnp.array([FILL_NE, FILL_TE, FILL_B], jnp.float32)
    v = jnp.where(jnp.isfinite(v), v, fills)

    recs = np.array(recs)
    recs[:, 0:3, idx] = np.asarray(r_rec).transpose(0, 2, 1)
    recs[:, 3, idx] = np.asarray(s_rec)
    recs[:, 4:7, idx] = np.asarray(v).transpose(0, 2, 1)

    new_state = np.array(new_state)
    new_state[idx, 0:3] = np.asarray(final[:, 0:3])
    new_state[idx, 3:6] = np.asarray(final[:, 3:6])
    new_state[idx, 6] = np.asarray(s_rec[-1])
    new_state[idx, 7] = 0.0
    return jnp.asarray(new_state), jnp.asarray(recs)


def _xla_segment(table, grid, start, kvec, dt, n_steps, stride, first_block,
                 trace_crosssections, perturb_ratio):
    """One segment on the XLA tracer with explicit initial k (not kc0 init)."""
    res = trace_rays(table, grid, 0.0, start, jnp.zeros_like(kvec), dt,
                     n_steps, stride, trace_crosssections, perturb_ratio,
                     "cumulative", first_block=first_block,
                     k_init=kvec)
    return res.r_record, res.s_record, res.final_state
