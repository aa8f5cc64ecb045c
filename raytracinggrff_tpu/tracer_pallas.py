"""Driver for the Pallas brick tracer: capacity binning, segments, tails.

Orchestrates ops/pallas_trace.run_trace_segment over the full step count:

  1. Before each segment, rays are re-binned with a kd-median partition
     (split the widest bbox axis at the median until every leaf's bbox
     fits one VMEM brick). kd bins are guaranteed spatially tight —
     Morton-curve discontinuities put rays from opposite sides of the
     domain into one bin (measured 40%+ brick-escape rates); refraction
     spreads bins apart over time, so binning once at launch is not
     enough either.
  2. OCCUPANCY IS THE THROUGHPUT KNOB: per-tile step cost is linear in
     lane width with ~zero fixed term (~10.5 ns/lane-step at the default
     brick; slope-method measurement, scripts/microbench_kernel.py — a
     naive per-launch timing reads a phantom ~4 us/tile fixed cost that
     is really the axon tunnel round-trip), so device time per step is
     simply (occupied lanes)/(95M lanes/s) and wide tiles per se buy
     nothing. Throughput is maximized by (a) bricks big enough that a
     capacity-bound leaf fills most of a tile (the fused-(y,x) matmul in
     ops/pallas_trace makes 32x16x16 bricks cost the same per lane as
     16x8x16) and (b) a lane width `rpt` matched to the chaotic-phase
     leaf size. (A two-class [hi | lo] tile layout was built and measured
     in round 3: with per-tile cost linear in lanes it bought nothing on
     any workload, so it was removed — see the round-3 history for the
     measurement.)
  3. Each segment advances `first_block + (rps-1)*stride` RK4 steps and
     yields `rps` records per ray (positions, cumulative S, Ne/Te/|B|),
     reproducing the reference's record schedule (a record after step i
     whenever i % stride == 0, build_rays.py:241-244). Records are
     re-ordered to ORIGINAL ray order on device before they are yielded.
  4. Rays that out-run their tile's brick are frozen in the kernel and
     RETRIED on the fast path: a device-resident graph compacts the
     escapees from BOTH regions into low-occupancy lo-region tiles
     (few rays per tile => much tighter bins) and re-runs the same
     segment, merging records/end-states without a host round-trip.
  5. Rays that escape the retry too leave the fast path permanently and
     are captured as "tails": after the segmented sweep, iter_tail_traces
     integrates every tail ONCE on the XLA reference tracer for its whole
     remaining horizon — each tailed ray costs one XLA trace and zero
     host record traffic.
  6. Consumers:
       * iter_trace_segments + iter_tail_traces — the streaming interface:
         per-segment device records in original ray order chain straight
         into the radiative-transfer carry without bulk records ever
         crossing the host tunnel (see pipeline.run_ray_tracing_emission).
       * trace_rays_pallas — assembles host records (tests, benchmark,
         reference-shaped API).

Multi-chip: pass `mesh` (a jax.sharding.Mesh with a 'rays' axis) and the
SAME async loop runs with every kernel launch shard_mapped over ray tiles
(the TPU equivalent of the reference's ProcessPool ray chunks,
resample_with_ray_tracing.py:333-352); the permutation/merge/retry graphs
are ordinary jit ops that GSPMD partitions around the kernels. The host
still never blocks on per-segment results.

A segment record with S == 0 is inert by construction: the transfer update
masks on S > 0 and the frozen position advances nothing (ds = 0), so tailed
rays' post-escape records vanish from the stream without scatter ops.

This is the TPU-native replacement for the reference's per-step CUDA kernel
launches (gpu_raytrace.py:383-398): the step loop never leaves the chip, and
LOS field sampling rides along in the same kernel.
"""

from __future__ import annotations

import functools
import time as _time
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .grids import UniformGrid
from .ops.pallas_trace import (BX, BY, BZ, CHECK_EVERY, PallasSegmentResult,
                               grid_param_vec, pack_sample_cube_zc,
                               pack_trace_cube_zc, run_trace_segment)
from .ops.trilinear import pack_fields, trilinear_packed
from .tracer import init_k_vectors, pack_trace_table, trace_rays
from .constants import C_R, FILL_B, FILL_NE, FILL_TE


@functools.partial(jax.jit, static_argnames=("grid",))
def _init_k0(omega_pe_cube, grid, freq_hz, start, kdir):
    """kc0 init sampling omega_pe directly from the raw cube (the reshape
    to a (N, 1) gather table is a free bitcast inside the jit)."""
    return init_k_vectors(omega_pe_cube.reshape(-1, 1), grid, freq_hz,
                          start, kdir)


def _prepare_trace_inputs(omega_pe_cube, ne_cube, te_cube, b_cube, grid,
                          start, kdir, freq_hz, bvec=None):
    """Kernel-layout packing + kc0 init as three jitted device programs
    (a handful of dispatches — eager per-op dispatch through the TPU
    tunnel costs seconds per op; this was ~2.5 min of setup when run
    eagerly). Deliberately NOT one fused graph: the fused version's
    transient peak (three gradient cubes + stack/transpose copies live at
    once) OOMed the 16 GB chip at 576^3 with the scene cubes resident;
    the staged packers stream y-chunks and bound the peak to roughly
    input cubes + the two packed outputs (see ops.pallas_trace.
    pack_trace_cube_zc).

    `bvec` (optional (bx, by, bz) image-frame Cartesian B cubes) widens the
    sample cube to 8 channels so the kernel can record cos(theta) between B
    and the local wave vector (theta_mode='los')."""
    tcube = pack_trace_cube_zc(omega_pe_cube, grid)
    if bvec is None:
        scube = pack_sample_cube_zc(ne_cube, te_cube, b_cube)
    else:
        scube = pack_sample_cube_zc(ne_cube, te_cube, b_cube,
                                    bvec[0], bvec[1], bvec[2], nch=8)
    k0 = _init_k0(omega_pe_cube, grid, freq_hz, start, kdir)
    return tcube, scube, k0


def _kernel_call(tcube, scube, kstate, gvec, mesh, gshape, rpt, rps,
                 stride, first_block, dt, perturb_ratio,
                 trace_crosssections, interpret, bx, by, bz, nch_s=4):
    """One trace-segment kernel launch; shard_mapped over ray tiles when a
    mesh is given (tiles are independent, cubes replicated). `gvec` is the
    dynamic grid origin/steps vector (grid_param_vec), `gshape` the static
    cube shape — one compiled kernel per shape, not per extent."""
    if mesh is None:
        return run_trace_segment(tcube, scube, kstate, gvec, gshape, rpt,
                                 rps, stride, first_block, dt,
                                 perturb_ratio, trace_crosssections,
                                 interpret, bx=bx, by=by, bz=bz,
                                 sample_channels=nch_s)
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    fn = shard_map(
        lambda a, b, c, g, d: run_trace_segment(
            a, b, c, g, gshape, rpt, rps, stride, first_block, d,
            perturb_ratio, trace_crosssections, interpret,
            bx=bx, by=by, bz=bz, sample_channels=nch_s),
        mesh=mesh,
        in_specs=(P(), P(), P("rays", None, None), P(), P()),
        out_specs=PallasSegmentResult(
            state=P("rays", None, None),
            records=P("rays", None, None, None)),
        check_vma=False)
    return fn(tcube, scube, kstate, jnp.asarray(gvec, jnp.float32),
              jnp.asarray(dt, jnp.float32))


@jax.jit
def _unpack_binning(packed, inv_prev):
    """Unpack the single per-rebind host upload: `packed[slot]` carries the
    new slot->original-id permutation in the low 31 bits and the park flag
    in the sign bit. The derived arrays (inverse permutation via scatter,
    the local slot->slot move through the PREVIOUS inverse) are computed
    on device — uploading them separately cost ~4 tunnel round-trips per
    rebind (~36 ms each) for data the device can derive from 1."""
    park = packed < 0
    gperm = packed & jnp.int32(0x7FFFFFFF)
    iota = jnp.arange(packed.shape[0], dtype=jnp.int32)
    inv = jnp.zeros_like(gperm).at[gperm].set(
        iota, unique_indices=True)
    local = inv_prev[gperm]
    return gperm, inv, park, local


@functools.partial(jax.jit, static_argnames=("n_tl", "rpt_lo", "n_rays"))
def _pre_kernel_dev(state, local, park_up, tailed, gperm, inv,
                    path_len, cap6, bounds2, act_floor, n_tl, rpt_lo,
                    n_rays):
    """Permute rows to the new binning and shape the (n_tot, 8) state into
    the (n_tiles, 8, width) tile layout, pre-freezing parked rays (park
    mask completed ON DEVICE: host park | current tailed, gathered to slot
    order, because the host's tailed mirror is stale by design in the
    async loop).

    Also emits a float16 (n_rays, 6) pos+k̂ snapshot in ORIGINAL ray order
    (gathered through `inv`, the orig->slot map): the next segment's
    binning only needs the real rays' 6 columns at heuristic precision —
    not the padding slots — and the f16 original-order slice is the
    smallest possible copy on the ~30 MB/s tunnel (a full slot-order
    snapshot was 4x bigger at tile_factor=4).

    The bins-fit check also runs HERE, on device: each tile's active rays'
    6-col key span (position + predicted endpoint at `path_len`) is
    scatter-reduced and compared against 1.1x the brick capacity `cap6`
    (see the driver's rebind policy comment for the 1.1x rationale). The
    host then reads ONE bool per segment and
    fetches the f16 snapshot only on the segments that actually rebind —
    the per-segment snapshot fetch was ~70% of steady-state wall time
    through the tunnel once the kernels got fast."""
    state = state[local]
    park = park_up | tailed[gperm]
    pf = park.astype(jnp.float32)
    parked = state.at[:, 7].set(pf)
    # parked rays also drop their cumulative S: a frozen ray's S collapses
    # to 0 on its first frozen step (degenerate perturbation cross-section),
    # and parking skips that step
    parked = parked.at[:, 6].set(jnp.where(pf > 0.5, 0.0, state[:, 6]))
    klo = parked.T.reshape(8, n_tl, rpt_lo).transpose(1, 0, 2)
    rows = state[inv[:n_rays]]
    k = rows[:, 3:6]
    kn = jnp.sqrt(jnp.sum(k * k, axis=1, keepdims=True))
    khat = k / jnp.maximum(kn, 1e-30)   # raw |k| ~ 1e8 overflows f16
    pos = rows[:, 0:3]
    key16 = jnp.concatenate([pos, khat], axis=1)

    slot = inv[:n_rays]
    alive = jnp.all((pos >= bounds2[0]) & (pos <= bounds2[1]), axis=1) \
        & ~tailed[:n_rays]
    act = alive & ~park[slot]
    key6 = jnp.concatenate([pos, pos + khat * path_len], axis=1)
    tile = slot // rpt_lo
    kmin = jnp.full((n_tl, 6), jnp.inf, jnp.float32).at[tile].min(
        jnp.where(act[:, None], key6, jnp.inf))
    kmax = jnp.full((n_tl, 6), -jnp.inf, jnp.float32).at[tile].max(
        jnp.where(act[:, None], key6, -jnp.inf))
    # empty tiles give kmax-kmin = -inf <= cap (fits); NaN keys compare
    # False (forces a rebind) — both the safe direction
    fit = jnp.all(kmax - kmin <= 1.1 * cap6[None, :])
    # Occupancy-decay trigger: rays that die (leave the cube) FREEZE in
    # place, so they never widen a tile's key span and the span check
    # alone would keep burning full tiles on dead lanes forever (measured:
    # the canonical 256^2 bench ran 5000 steps at occupancy 1.0 / 512
    # tiles with ~35% of rays long dead — rebinding compacts the survivors
    # into ~2/3 the tiles and device time follows occupied tiles).
    fit = fit & (jnp.sum(act) >= act_floor)
    # `act` rides back with key16 on rebind segments so the host bins with
    # the DEVICE's liveness (incl. fresh tails) — the host's own tailed
    # mirror is stale by design, and binning device-tailed rays as alive
    # polluted rebuilt leaves with frozen positions (measured: such leaves
    # caused immediate brick escapes, 280 retries/56 tails per 256^2 run)
    return state, klo, key16.astype(jnp.float16), park, fit, act


@functools.partial(jax.jit, static_argnames=("rps",))
def _dead_record_block(prev_recs, rps):
    """Inert (rps, 8, n_tot) record block for segments after every ray has
    left the cube (or tailed): the final record row repeated with S = 0 —
    exactly what the kernel would emit for all-frozen rays, at the cost of
    one cheap XLA op instead of the full per-segment dispatch chain."""
    row = prev_recs[-1:]
    row = jnp.concatenate(
        [row[:, 0:3], jnp.zeros_like(row[:, 3:4]), row[:, 4:]], axis=1)
    return jnp.broadcast_to(row, (rps,) + row.shape[1:])


def _untile(kstate):
    """(n_tiles, 8, w) tile layout back to (n, 8) rows."""
    n = kstate.shape[0] * kstate.shape[2]
    return jnp.transpose(kstate, (1, 0, 2)).reshape(8, n).T


def _untile_recs(rec_tiles):
    """(n_tiles, rps, 8, w) record tiles -> (rps, 8, n) slot order."""
    n = rec_tiles.shape[0] * rec_tiles.shape[3]
    rps = rec_tiles.shape[1]
    return rec_tiles.transpose(1, 2, 0, 3).reshape(rps, 8, n)


@functools.partial(jax.jit, static_argnames=(
    "mesh", "gshape", "rpt_lo", "rps", "stride", "first_block",
    "perturb_ratio", "trace_crosssections", "interpret",
    "brick_lo", "nch_s"))
def _trace_graph(tcube, scube, klo, gvec, mesh, gshape, rpt_lo, rps,
                 stride, first_block, dt, perturb_ratio,
                 trace_crosssections, interpret, brick_lo, nch_s=4):
    """Segment kernel + unpack for the async loop: returns the (n_tot, 8)
    end state in slot order, escape flags, and the raw record tiles (the
    retry graph does the record assembly). Collapsing dispatches matters
    through the axon tunnel, where every dispatch costs ~0.1 s of
    round-trip latency."""
    res_lo = _kernel_call(
        tcube, scube, klo, gvec, mesh, gshape, rpt_lo, rps, stride,
        first_block, dt, perturb_ratio, trace_crosssections,
        interpret, *brick_lo, nch_s=nch_s)
    esc = res_lo.state[:, 7, :].reshape(-1) > 0.5
    state = _untile(res_lo.state).at[:, 7].set(0.0)
    return state, esc, res_lo.records


@functools.partial(jax.jit, static_argnames=(
    "mesh", "gshape", "rpt_lo", "n_tl", "rps", "stride",
    "first_block", "perturb_ratio", "trace_crosssections",
    "interpret", "brick_lo", "occ_r", "nch_s"))
def _retry_graph(tcube, scube, seg_start, state_main, esc, raw_lo,
                 inv, park_main, tailed, tail_state, tail_seg,
                 n_retried, seg_idx, gvec,
                 mesh, gshape, rpt_lo, n_tl, rps, stride, first_block,
                 dt, perturb_ratio, trace_crosssections, interpret,
                 brick_lo, occ_r=1, nch_s=4):
    """Device-resident escape handling: compact the escapees, re-run their
    segment in fresh tiles at occupancy occ_r, merge records/end-states,
    and update the tail carries — all without a host round-trip, so the
    driver loop can dispatch segment after segment without ever blocking
    on escape counts.

    occ_r=1 makes the retry all but escape-proof: a single-ray tile's
    bbox is a point, so the brick recenters on it at every reload and
    only retry-capacity overflow (> n_tl*occ_r escapees in one segment)
    can still tail out. All-parked retry tiles skip their step loop, so
    the retry costs ~(escapees x rpt x steps) lanes, not the full slot
    space. The driver picks occ_r adaptively: 1 whenever the tile count
    alone gives enough capacity (large workloads — zero tail-out on the
    canonical bench), higher on small workloads where n_tl is the
    binding constraint (a few re-escapes beat wholesale overflow).

    The retry binning is a rank compaction of the escapees in their slot
    order (cumsum + one co-sort, no gathers beyond jnp.take): slot order is
    spatial within each leaf, so compacted neighbors are spatially near and
    occ_r rays per tile bin tightly. Rays whose retry escapes again become
    tails: their seg-start state and segment index land in the
    (original-ray-indexed) tail_state / tail_seg carries via dense masked
    updates, read back once after the whole trace.

    All index spaces: `esc`, `park_main` are in SLOT order; `inv` maps
    original ray -> slot; `tailed` and the tail carries are in ORIGINAL
    ray order. Returns (state_slot_order, recs_orig_order, tailed,
    tail_state, tail_seg, n_retried, esc_any)."""
    n_tot = seg_start.shape[0]
    n_lo = n_tl * rpt_lo
    iota = jnp.arange(n_tot, dtype=jnp.int32)

    retry = esc & ~park_main                     # slot space
    has_esc = jnp.any(retry)
    recs_m = jnp.take(_untile_recs(raw_lo), inv, axis=2)

    def _zero_tail_s(recs, tail_mask_o):
        s_rec = jnp.where(tail_mask_o[None, :], 0.0, recs[:, 3, :])
        return jnp.concatenate(
            [recs[:, 0:3], s_rec[:, None, :], recs[:, 4:]], axis=1)

    def with_retry(_):
        rank = (jnp.cumsum(retry.astype(jnp.int32))
                - retry.astype(jnp.int32))
        m = jnp.sum(retry.astype(jnp.int32))
        sort_key = jnp.where(retry, rank, n_tot + 1).astype(jnp.int32)
        _, sorted_slots = jax.lax.sort((sort_key, iota), num_keys=1)

        j = jnp.arange(n_lo, dtype=jnp.int32)
        t = j // rpt_lo
        s = j % rpt_lo
        r_of_slot = t * occ_r + s
        valid = (s < occ_r) & (r_of_slot < m)
        src_slot = sorted_slots[jnp.clip(r_of_slot, 0, n_tot - 1)]
        rows = seg_start[jnp.where(valid, src_slot, 0)]
        kstate_r = rows.T.reshape(8, n_tl, rpt_lo).transpose(1, 0, 2)
        park_f = (~valid).astype(jnp.float32).reshape(n_tl, rpt_lo)
        kstate_r = kstate_r.at[:, 7, :].set(park_f)
        kstate_r = kstate_r.at[:, 6, :].set(
            jnp.where(park_f > 0.5, 0.0, kstate_r[:, 6, :]))

        res_r = _kernel_call(tcube, scube, kstate_r, gvec, mesh, gshape,
                             rpt_lo, rps, stride, first_block, dt,
                             perturb_ratio, trace_crosssections, interpret,
                             *brick_lo, nch_s=nch_s)
        esc_r = res_r.state[:, 7, :].reshape(n_lo) > 0.5
        state_r = _untile(res_r.state).at[:, 7].set(0.0)

        # main slot p's retry slot (arithmetic inverse of the compaction).
        # Escapees beyond the retry capacity (rank >= n_tl*occ_r never got
        # a retry slot) are double-escapes outright: without the overflow
        # mask the clamped gathers below would splice ANOTHER ray's retry
        # state/records into them.
        overflow = retry & (rank >= n_tl * occ_r)
        placed = retry & ~overflow
        q_of_p = (rank // occ_r) * rpt_lo + rank % occ_r
        q_of_p = jnp.where(placed, q_of_p, 0)
        dbl_p = retry & (esc_r[q_of_p] | overflow)
        ok_p = retry & ~dbl_p

        state = jnp.where(placed[:, None], state_r[q_of_p], state_main)

        recs_r = _untile_recs(res_r.records)
        recs_r = jnp.take(recs_r, q_of_p[inv], axis=2)
        use_retry_o = ok_p[inv]
        recs = jnp.where(use_retry_o[None, None, :], recs_r, recs_m)
        dbl_o = dbl_p[inv]
        recs = _zero_tail_s(recs, tailed | dbl_o)

        # tail carries (original ray order)
        seg_start_o = seg_start[inv]
        tail_state2 = jnp.where(dbl_o[:, None], seg_start_o, tail_state)
        tail_seg2 = jnp.where(dbl_o & (tail_seg < 0), seg_idx, tail_seg)
        return (state, recs, tailed | dbl_o, tail_state2, tail_seg2, m)

    def no_retry(_):
        return (state_main, _zero_tail_s(recs_m, tailed), tailed,
                tail_state, tail_seg, jnp.int32(0))

    state, recs, tailed, tail_state, tail_seg, m = jax.lax.cond(
        has_esc, with_retry, no_retry, None)
    return (state, recs, tailed, tail_state, tail_seg, n_retried + m,
            has_esc)


@functools.partial(jax.jit, static_argnames=(
    "mesh", "gshape", "rpt_lo", "n_tl", "rps", "stride",
    "first_block", "perturb_ratio", "trace_crosssections",
    "interpret", "brick_lo", "occ_r", "nch_s"))
def _segment_graph(tcube, scube, seg_start, klo, park_dev, tailed,
                   tail_state, tail_seg, n_retried, seg_idx, gvec, inv,
                   mesh, gshape, rpt_lo, n_tl, rps, stride, first_block,
                   dt, perturb_ratio, trace_crosssections, interpret,
                   brick_lo, occ_r=1, nch_s=4):
    """Trace + device-resident retry as ONE dispatch.

    Two reasons, in order of measured impact: (1) the segment's Mosaic
    kernel compiles once per variant instead of twice — it used to appear
    in both the _trace_graph and _retry_graph executables (8 s + 17 s
    cold, scripts/compile_audit.py); (2) one fewer host dispatch per
    segment. On the axon tunnel the dispatch saving measured ~nil (the
    async queue already hid enqueue cost: bench 'enqueue' phase 0.01 s),
    but it is free insurance for slower hosts. The canonical bench is
    DEVICE-bound at ~21.8 ns/lane-step (the moving-ray microbench slope),
    not dispatch-bound — a round-5 model error previously blamed
    'dispatch overhead' for what is simply MXU time."""
    state_main, esc, raw_lo = _trace_graph(
        tcube, scube, klo, gvec, mesh, gshape, rpt_lo, rps, stride,
        first_block, dt, perturb_ratio, trace_crosssections, interpret,
        brick_lo, nch_s=nch_s)
    return _retry_graph(
        tcube, scube, seg_start, state_main, esc, raw_lo, inv, park_dev,
        tailed, tail_state, tail_seg, n_retried, seg_idx, gvec, mesh,
        gshape, rpt_lo, n_tl, rps, stride, first_block, dt, perturb_ratio,
        trace_crosssections, interpret, brick_lo, occ_r=occ_r, nch_s=nch_s)


class PallasTraceResult(NamedTuple):
    r_record: np.ndarray   # (n_records, n_rays, 3)
    s_record: np.ndarray   # (n_records, n_rays) cumulative S
    ne: np.ndarray         # (n_records, n_rays)
    te: np.ndarray
    b: np.ndarray
    escape_fraction: float
    cos_theta: np.ndarray | None = None  # signed cos(B,k) when bvec given


class TailGroup(NamedTuple):
    """Rays that left the fast path at one segment: one-shot XLA work."""
    orig_ids: np.ndarray    # (n,) original ray indices
    state: np.ndarray       # (n, 8) seg-start rows [r, k, cumS, 0]
    rec_base: int           # records already emitted before the segment
    first_block: int        # steps before the segment's first record


def _split_leaves_levels(keyn, order, counts, max_leaf, budget):
    """Level-synchronous kd capacity splitting on a pre-NORMALIZED key
    (key / capacity: a leaf fits iff its bbox width <= 1 on every axis).

    Starts from an existing partition (`order` holds row indices leaf-major,
    `counts` the per-leaf sizes) and, each level, median-splits EVERY leaf
    that is oversized (> max_leaf rows) or wider than its capacity on some
    axis. This is the vectorized replacement for the old worst-first heap
    loop — that pure-Python loop cost 0.3-0.5 s per rebind at 256^2 rays
    and became the end-to-end critical path once the kernel got fast
    (VERDICT round 2, weak #4); each level here is a handful of whole-array
    numpy passes (reduceat bboxes + one lexsort of the splitting rows), so
    a full 65k-ray rebind runs in tens of milliseconds.

    When the tile budget cannot absorb all pending splits, the worst leaves
    win (size-mandated splits first, then widest span ratio) — the same
    priority the heap used. Size-mandated cuts land on max_leaf multiples
    so the mandatory phase needs exactly ceil(n/max_leaf) leaves.
    Returns the updated (order, counts); leaves that still violate the
    capacity when the budget runs out are the retry path's problem, and
    leaves still > max_leaf are chunked by the placement stage.
    """
    n = len(order)
    if n == 0:
        return order, counts
    order = order.copy()
    keyn = np.ascontiguousarray(keyn, np.float32)   # heuristic precision
    keyo = keyn[order]
    while len(counts) < budget:
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        mx = np.maximum.reduceat(keyo, starts, axis=0)
        mn = np.minimum.reduceat(keyo, starts, axis=0)
        widths = mx - mn
        ratio = widths.max(axis=1)
        must = counts > max_leaf
        want = (must | (ratio > 1.0)) & (counts > 1)
        n_want = int(want.sum())
        if n_want == 0:
            break
        room = budget - len(counts)
        if n_want > room:
            prio = np.where(want, must * 1e3 + ratio, -1.0)
            keep = np.argpartition(prio, len(prio) - room)[-room:]
            sel = np.zeros(len(counts), bool)
            sel[keep] = True
            want &= sel
        leaf_of_row = np.repeat(np.arange(len(counts), dtype=np.int64),
                                counts)
        ax = np.argmax(widths, axis=1)
        sub = np.flatnonzero(want[leaf_of_row])
        lf = leaf_of_row[sub]
        v = keyo[sub, ax[lf]].astype(np.float64)
        # one composite-key argsort (leaf-major, value within leaf) beats a
        # two-key lexsort; sub-ulp value ties just move the cut by a row
        lo, hi = v.min(), v.max()
        v = (v - lo) / max(hi - lo, 1e-30)
        s_local = np.argsort(lf + v * 0.999)
        order[sub] = order[sub[s_local]]
        keyo[sub] = keyo[sub[s_local]]
        half = counts // 2
        hb = np.maximum(max_leaf, (half // max_leaf) * max_leaf)
        half = np.where(must, hb, half)
        c1 = np.where(want, half, counts)
        cc = np.stack([c1, counts - c1], axis=1).ravel()
        counts = cc[cc > 0]
    return order, counts


def capacity_bin_slots(key, alive, rpt, n_tiles, capacity):
    """Variable-occupancy capacity-aware partition over the tile slots.

    Splits the alive rays against the brick `capacity` (level-synchronous
    kd median splits, _split_leaves_levels) into leaves of at most `rpt`
    rays, then gives each leaf its own tile. Leaves still larger than rpt
    when the split budget runs out are chunked along their widest axis
    into rpt-sized sub-bins (spatially tight); as a last resort remaining
    rays are stuffed capacity-blind into whatever slots are free — those
    bins may escape, and the device retry / XLA tails absorb them, so
    placement never fails.

    Returns (perm, park): perm is a permutation of row indices arranging
    rays bin-major (tile t's leaf occupies slots [t*rpt, ...)); non-alive
    rows fill the remaining slots; park marks those filler slots (the
    kernel freezes them via the esc row and skips all-parked tiles)."""
    n_tot = len(alive)
    idx = np.flatnonzero(alive).astype(np.int64)
    key = np.asarray(key, np.float32)
    capacity = np.asarray(capacity, np.float32)

    bins, overflow = [], []
    left = n_tiles
    if len(idx):
        order, counts = _split_leaves_levels(
            key / capacity, idx, np.array([len(idx)], np.int64), rpt,
            n_tiles)
        starts = np.concatenate(([0], np.cumsum(counts[:-1])))
        leaves = [order[s:s + c] for s, c in zip(starts, counts)]
        leaves.sort(key=len, reverse=True)
        for rows in leaves:
            n = len(rows)
            if n <= rpt and left:
                bins.append(rows)
                left -= 1
            elif left:
                # big leaf (split budget ran out): chunk along the widest
                # axis so the sub-bins stay spatially tight
                p = key[rows]
                ax = int(np.argmax((p.max(axis=0) - p.min(axis=0))
                                   / capacity))
                rows = rows[np.argsort(p[:, ax], kind="stable")]
                need = -(-n // rpt)
                take = min(need, left)
                for c in range(take):
                    bins.append(rows[c * rpt:(c + 1) * rpt])
                left -= take
                if take < need:
                    overflow.append(rows[take * rpt:])
            else:
                overflow.append(rows)
    if overflow:
        rest = np.concatenate(overflow)
        pos = 0
        while pos < len(rest) and left:
            bins.append(rest[pos:pos + rpt])
            pos += rpt
            left -= 1
        if pos < len(rest):
            # Every tile is taken but earlier capacity bins sit below full
            # width: spill the remainder into their padding slots. Spilled
            # rays land in the wrong brick and escape on their first step,
            # which the device retry / XLA tails absorb — placement
            # degrading into escapes is strictly better than aborting a
            # multi-minute trace (this used to raise).
            rest_left = rest[pos:]
            for i, rows in enumerate(bins):
                if not len(rest_left):
                    break
                room = rpt - len(rows)
                if room > 0:
                    bins[i] = np.concatenate([rows, rest_left[:room]])
                    rest_left = rest_left[room:]
            if len(rest_left):
                # unreachable: total tile width n_tiles*rpt == n_tot
                # >= n_rays >= alive rays
                raise RuntimeError(
                    f"slot budget exhausted: {len(rest_left)} rays "
                    f"unplaced (n_tiles={n_tiles})")

    perm = np.empty(n_tot, np.int64)
    park = np.ones(n_tot, bool)
    pool = np.flatnonzero(~alive)
    pool_pos = 0
    t = 0
    for rows in bins:
        base = t * rpt
        perm[base:base + len(rows)] = rows
        park[base:base + len(rows)] = False
        n_pad = rpt - len(rows)
        perm[base + len(rows):base + rpt] = pool[pool_pos:pool_pos + n_pad]
        pool_pos += n_pad
        t += 1
    n_rest = (n_tiles - t) * rpt
    perm[t * rpt:n_tiles * rpt] = pool[pool_pos:pool_pos + n_rest]
    return perm, park


def _segment_plan(n_steps, record_stride, seg_records):
    n_records = -(-n_steps // record_stride)
    # Chunk into UNIFORM seg_records-sized segments: the final partial
    # segment is padded up to the full record count (the driver slices the
    # yielded block down to the real rows), so at most 2 distinct
    # (first_block, rps) kernel variants get Mosaic-compiled — (1, seg)
    # for segment 0 and (stride, seg) for the rest — instead of a third
    # ~15-25 s trace+retry compile for every distinct remainder (the
    # TbSpectra sweep lattice hits several). The padded steps run past
    # n_steps on rays nobody reads; on the canonical bench the tail
    # segments are all-dead and fabricated anyway.
    seg = min(seg_records, n_records)
    plan = []
    rec_left = n_records
    first = True
    while rec_left > 0:
        plan.append((1 if first else record_stride, seg))
        first = False
        rec_left -= seg
    return plan, n_records


def _brick_capacity(grid, brick, dt, perturb_ratio, trace_crosssections):
    """Usable brick extent (R_sun per axis) after the kernel's per-side
    reload margin (check_every steps of motion + cross-section perturbation
    reach incl. the pipelined pair's one-step lag + one interpolation cell,
    matching ops.pallas_trace._make_kernel), duplicated for the
    predicted-endpoint columns of the 6-col bin key."""
    ce = CHECK_EVERY
    reach = ((perturb_ratio + 2.0 + ce) if trace_crosssections
             else (1.0 + ce)) * dt * C_R
    steps_d = np.array([grid.dx, grid.dy, grid.dz])
    marg = 1.0 + reach / steps_d
    # [0, 0, 1]: the kernel rounds the z brick origin down to an even cell
    # (DMA sublane-tile alignment of the fused z*channel dim), worth up to
    # one cell of usable z extent
    capacity = np.maximum(np.array(brick, np.float64) - 1.0 - 2.0 * marg
                          - np.array([0.0, 0.0, 1.0]),
                          1.0) * steps_d
    return np.concatenate([capacity, capacity])


def iter_trace_segments(
    omega_pe_cube, ne_cube, te_cube, b_cube,
    grid: UniformGrid, freq_hz,
    start, kdir, dt, n_steps, record_stride=10,
    trace_crosssections=True, perturb_ratio=2.0,
    rpt=256, seg_records=64, interpret=False, verbose=False,
    stats=None, mesh=None, brick=(BX, BY, BZ), tile_factor=4,
    bvec=None, bin_horizon=1.3, rebind_decay=0.7,
):
    """Generator yielding (rps, 8, n_tot) device records per segment, rows
    [x,y,z,S,ne,te,b,cos_theta], columns in ORIGINAL ray order (column i is ray
    i; columns n_rays..n_tot are padding). Tailed rays' records carry S=0
    from their escape segment on — consume their true records via
    iter_tail_traces(stats, ...) after this generator is exhausted.

    `stats` (optional dict) receives: 'tails' (list of TailGroup),
    'escaped' (total rays tailed), 'n_records', 'n_tot', 'plan'.

    `mesh` (optional jax.sharding.Mesh with a 'rays' axis) partitions every
    kernel launch over chips via shard_map; cubes are replicated and the
    re-binning permutation rides XLA collectives over ICI.

    `bvec` (optional (bx, by, bz) image-frame Cartesian B cubes) makes the
    kernel record signed cos(theta) between B and the wave vector in record
    row 7 (theta_mode='los'; the 4-channel sample cube becomes 8-channel).

    `seg_records` trades per-segment dispatch overhead (~0.08-0.18 s of
    XLA glue + tunnel latency per segment, see bench.py's device_model)
    against record-block VMEM and bin staleness; 64 measured 7.4e7 vs
    5.6e7 ray-steps/s at 16 on the canonical bench (fit_brick shrinks the
    brick if the record block would overflow scoped VMEM).
    `rebind_decay`: force a rebind when the active-ray count falls below
    this fraction of the count at the last binning — dead rays freeze in
    place and never trip the span check, so without this the kernel keeps
    paying for their tiles (see _pre_kernel_dev).
    """
    n_rays = start.shape[0]
    # rpt caps the max lo leaf size and sets the lo lane width; floor 128
    # for MXU/VPU lane efficiency. tile_factor over-allocates lo tile slots
    # (n_lo = tile_factor * next_pow2(n_rays)) so the capacity-aware binner
    # can run many small leaves when rays disperse into a 3-D volume — with
    # a 1x budget a fixed-count binner is FORCED to build bins wider than a
    # brick once local ray density drops below rpt / brick_volume, and
    # every such bin escapes.
    per64 = max(1, n_rays // 64)
    rpt = int(min(rpt, max(128, 1 << (per64.bit_length() - 1))))
    n_lo = rpt
    while n_lo < n_rays:
        n_lo *= 2
    n_lo *= max(1, int(tile_factor))
    # floor of 32 tiles: small images otherwise get so few tiles that the
    # binner cannot isolate chaotic post-reflection rays (a 16^2 image at
    # 4 tiles measured 71% tail-out; at 32 tiles effectively none)
    n_lo = max(n_lo, 32 * rpt)
    nch_s = 8 if bvec is not None else 4
    nx_pad = -(-grid.nx // 128) * 128

    def kernel_vmem(b, rpt_k, rps_k):
        """Scoped-VMEM estimate (bytes) of one trace-kernel instance:
        the two staging bricks + fused windows + state/record blocks
        (ops/pallas_trace.run_trace_segment scratch_shapes) plus a
        lane-width-proportional stack/spill term calibrated on two
        measured compile-time OOMs (16.21 MiB at rpt=128/nch_s=8 with
        12.9 MiB of scratch -> 3.5 MiB overhead; 17.69 MiB at
        rpt=512/nch_s=4 with 9.2 MiB -> 8.9 MiB)."""
        bx_, by_, bz_ = b
        w_pad = max(nx_pad, by_ * bx_)
        stage = by_ * bz_ * (4 + nch_s) * w_pad * 4
        wins = bz_ * (4 + nch_s) * by_ * bx_ * 4
        blocks = (2 * 8 * rpt_k + rps_k * 8 * rpt_k + rpt_k) * 4
        spill = 28000 * rpt_k
        return stage + wins + blocks + spill

    def fit_brick(b, rpt_k):
        """Shrink brick y/z to the cube (those axes are DMA-sliced, so a
        brick taller than the cube would slice out of range; x rides the
        full padded lane axis and tolerates any bx via the cyclic roll),
        then halve bz until the kernel's scoped VMEM fits: the 8-channel
        theta_mode='los' sample brick doubles the staging cost, and the
        default (32, 16, 32) brick overflows the 16M Mosaic limit by
        ~0.2M at nch_s=8 (measured: compile-time OOM on hardware)."""
        bx_, by_, bz_ = (int(v) for v in b)
        while by_ > grid.ny and by_ > 2:
            by_ //= 2
        while bz_ > grid.nz and bz_ > 2:
            bz_ //= 2
        budget = 16 << 20    # the Mosaic scoped-VMEM limit
        while kernel_vmem((bx_, by_, bz_), rpt_k, seg_records) > budget \
                and bz_ > 8:
            bz_ //= 2
        while kernel_vmem((bx_, by_, bz_), rpt_k, seg_records) > budget \
                and by_ > 8:
            by_ //= 2
        return (bx_, by_, bz_)

    brick_lo = fit_brick(brick, rpt)
    plan, n_records = _segment_plan(n_steps, record_stride, seg_records)
    # Adaptive floor from a LAUNCH-state probe: sparse-ray workloads (small
    # n_pix over a wide FOV — e.g. the TbSpectra low band at reduced N_pix)
    # need more capacity leaves than rays/rpt would suggest, because each
    # leaf must fit one brick regardless of how few rays it holds. With the
    # static budget a 32^2-pixel sweep frame measured 95% tail-out (the
    # binner stuffed the un-splittable remainder capacity-blind and every
    # stuffed ray escaped on its first step). One unbounded kd split of the
    # launch positions counts the leaves actually needed; 2x that covers
    # mid-trace dispersal, and the device retry/tails absorb the rest.
    path0 = (bin_horizon * (plan[0][0] + (plan[0][1] - 1) * record_stride)
             * dt * C_R)
    pos0 = np.asarray(start, np.float32)
    k0h = np.asarray(kdir, np.float32)
    key0 = np.concatenate([pos0, pos0 + k0h * np.float32(path0)], axis=1)
    blo = np.array(grid.origin, np.float32)
    bhi = blo + np.array([(grid.nx - 1) * grid.dx, (grid.ny - 1) * grid.dy,
                          (grid.nz - 1) * grid.dz], np.float32)
    idx0 = np.flatnonzero(
        np.all((pos0 >= blo) & (pos0 <= bhi), axis=1)).astype(np.int64)
    if len(idx0):
        cap0 = _brick_capacity(grid, brick_lo, dt, perturb_ratio,
                               trace_crosssections)
        _, counts0 = _split_leaves_levels(
            key0 / cap0, idx0, np.array([len(idx0)], np.int64), rpt,
            n_rays)
        n_lo = max(n_lo, 2 * len(counts0) * rpt)
    n_shards = int(mesh.shape["rays"]) if mesh is not None else 1
    if n_shards > 1:
        # every shard needs at least one lo tile
        while n_lo // rpt < n_shards and rpt > 8:
            rpt //= 2
        n_lo = max(n_lo, rpt * n_shards)
    n_tl = n_lo // rpt
    # The tile count is the Pallas grid size — a COMPILE key. Rounding it
    # up to a power of two keeps the adaptive budget (which varies with
    # launch geometry, dt, and step count) from minting a fresh Mosaic
    # kernel per workload: a 30-frequency TbSpectra sweep shares one
    # variant per (cube shape, stride) instead of one per frequency.
    # Padding tiles are all-parked and skip their step loop in-kernel.
    n_tl = 1 << int(np.ceil(np.log2(max(n_tl, 1))))
    if n_shards > 1:                 # shard_map needs tiles % shards == 0
        n_tl = -(-n_tl // n_shards) * n_shards
    n_lo = n_tl * rpt
    n_tot = n_lo

    # Retry occupancy: 1 (escape-proof single-ray tiles) whenever the tile
    # count alone gives ~256 rays of per-segment retry capacity; on small
    # workloads (few tiles) raise it so capacity overflow — which tails
    # rays wholesale — stays the rare case (a 256-ray image at 8 tiles
    # measured 55/256 rays tailed purely from occ_r=1's 8-ray capacity).
    occ_r = max(1, min(rpt, -(-min(n_lo // 4, 256) // n_tl)))

    omega_pe_cube = jnp.asarray(omega_pe_cube, jnp.float32)
    if bvec is not None:
        bvec = tuple(jnp.asarray(c, jnp.float32) for c in bvec)
    tcube, scube, k0 = _prepare_trace_inputs(
        omega_pe_cube, jnp.asarray(ne_cube, jnp.float32),
        jnp.asarray(te_cube, jnp.float32), jnp.asarray(b_cube, jnp.float32),
        grid, jnp.asarray(start, jnp.float32),
        jnp.asarray(kdir, jnp.float32), jnp.float32(freq_hz), bvec)

    state_h = np.zeros((n_tot, 8), np.float32)
    state_h[:, 0] = grid.x0 - 1e6    # dummy padding: frozen outside cube
    state_h[:n_rays, 0:3] = np.asarray(start, np.float32)
    state_h[:n_rays, 3:6] = np.asarray(k0)
    state_h[:, 6] = 1.0

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        tcube, scube = (jax.device_put(c, NamedSharding(mesh, P()))
                        for c in (tcube, scube))
        state = jax.device_put(
            jnp.asarray(state_h), NamedSharding(mesh, P("rays", None)))
    else:
        state = jnp.asarray(state_h)

    if stats is None:
        stats = {}
    stats.setdefault("escaped", 0)
    stats["tails"] = []
    stats["n_records"] = n_records
    stats["n_tot"] = n_tot

    # kd capacity in R_sun per axis: the binner splits leaves against the
    # usable brick extent (see capacity_bin_slots)
    cap_lo6 = _brick_capacity(grid, brick_lo, dt, perturb_ratio,
                              trace_crosssections)
    bounds_lo, bounds_hi = blo, bhi

    park_slots = None                   # set by the first binning

    def bin_key(rows_h, act_h, path_len):
        """6-column bin key (current position + straight-line predicted
        segment endpoint pos + khat*path_len) and the alive mask, from
        the (n_rays, 6) ORIGINAL-order [pos, khat] snapshot. Grouping on
        both position and endpoint keeps a tile's rays inside one brick
        for the whole segment where the k-field fans out (reflection
        regions). Dead (out-of-cube) and tailed rays are excluded: act_h
        is the device's own activity mask (fresh tails included) when the
        snapshot came off device, None for the host-built initial state."""
        pos = rows_h[:, 0:3].astype(np.float32)
        end = pos + rows_h[:, 3:6].astype(np.float32) * np.float32(path_len)
        alive = (np.all((pos >= bounds_lo) & (pos <= bounds_hi), axis=1)
                 if act_h is None else np.asarray(act_h))
        return np.concatenate([pos, end], axis=1), alive

    # Whether the current binning still fits is checked ON DEVICE in
    # _pre_kernel_dev (one bool read per segment instead of the full f16
    # snapshot fetch). The threshold there is deliberately LOOSER (1.1x)
    # than the splitter's build target (1.0x capacity): a fresh binning
    # always sits just under 1.0x, so a tighter check would flunk it
    # immediately and force a rebind EVERY segment (measured: the coherent
    # phase rebound 25/25 segments at a 0.9x threshold). Bins between
    # 1.0-1.1x risk a few brick escapes, which the device-resident occ_r=1
    # retry mops up for ~nothing; rebinds cost host time and a snapshot
    # fetch on the steady-state critical path.
    def bin_rays(rows_h, act_h, path_len):
        """Capacity-aware binning on the 6-column original-order key.
        Returns (gperm_new, park) — gperm_new[slot] = original id.

        With a mesh, occupied tiles are round-robined across the shards'
        contiguous slot ranges: capacity_bin_slots packs occupied tiles as
        a leaf-major PREFIX (spatially clustered), so a limb-concentrated
        ray distribution would otherwise land every occupied tile in one
        shard and SPMD would wait on that straggler (all-parked tiles skip
        their step loop, so shard device time ~ occupied tiles). Tiles are
        independent — the permutation rides the same gperm upload for
        free and balances occupied-tile counts to within one tile."""
        key, alive = bin_key(rows_h, act_h, path_len)
        alive_full = np.zeros(n_tot, bool)
        alive_full[:n_rays] = alive
        gperm, park = capacity_bin_slots(key, alive_full, rpt, n_tl,
                                         cap_lo6)
        if n_shards > 1:
            per_shard = n_tl // n_shards
            t = np.arange(n_tl)
            new_pos = (t % n_shards) * per_shard + t // n_shards
            slot_map = (new_pos[:, None] * rpt
                        + np.arange(rpt)[None, :]).reshape(-1)
            g2 = np.empty_like(gperm)
            p2 = np.empty_like(park)
            g2[slot_map] = gperm
            p2[slot_map] = park
            gperm, park = g2, p2
        return gperm, park
    stats.setdefault("retried", 0)
    # HOST-side phase timers. These say where the HOST spent its wall
    # clock, not where device cycles went: "enqueue" is dispatch cost only
    # (the kernels run async), and "device_wait" is the host blocked on the
    # 1-byte bins-fit flag — i.e. hidden DEVICE execution time (the flag
    # read throttles the host to ~one segment behind the device). Device
    # cycles are accounted separately via seg_tiles/seg_steps (occupied
    # lane-steps per segment; see bench.py's device_model).
    timers = stats.setdefault(
        "phase_s", {"device_wait": 0.0, "snapshot_fetch": 0.0,
                    "bin_host": 0.0, "enqueue": 0.0, "tail_readback": 0.0})
    clock = _time.perf_counter
    cap6_dev = jnp.asarray(cap_lo6, jnp.float32)
    bounds2_dev = jnp.asarray(np.stack([bounds_lo, bounds_hi]), jnp.float32)
    # dynamic grid origin/steps: one compiled kernel per cube SHAPE, so the
    # TbSpectra sweep's continuously-interpolated grid extents share
    # compiles (see ops.pallas_trace.grid_param_vec)
    gvec_dev = jnp.asarray(grid_param_vec(grid))

    # Pipelined binning: segment i+1's binning runs WHILE segment i's
    # kernel executes, using segment i's START state (whose device->host
    # copy was itself enqueued right after the kernel dispatch, so the
    # transfer hides behind kernel execution instead of serializing with
    # it through the ~30 MB/s tunnel). The bins applied to a segment are
    # therefore one segment stale; the 2x prediction horizon below covers
    # the extra motion and the fast-path retry absorbs residual escapes.
    def horizon(fb, nrec):
        # bin_horizon x the segment's path length: the snapshot the bins
        # are computed from is one segment stale, so >1 covers the extra
        # motion; the device-resident retry absorbs what the margin
        # misses, so a tight factor (bigger leaves -> higher occupancy)
        # beats a safe one (2.0 measured ~35% smaller leaves, 0 retries
        # saved, on the canonical bench)
        return bin_horizon * (fb + (nrec - 1) * record_stride) * dt * C_R

    def host_key6(rows8):
        pos = np.asarray(rows8[:, 0:3], np.float32)
        k = np.asarray(rows8[:, 3:6], np.float64)
        kn = np.sqrt((k * k).sum(axis=1, keepdims=True))
        return np.concatenate(
            [pos, (k / np.maximum(kn, 1e-30)).astype(np.float32)], axis=1)

    next_bin = bin_rays(host_key6(state_h[:n_rays]), None,
                        horizon(*plan[0]))

    # ----------------------------------------------------------------------
    # Async loop: the host NEVER blocks on per-segment results. Each
    # segment is three queued device programs (permute/park -> kernels ->
    # device-side retry+merge); escape handling and tail bookkeeping live
    # in device carries, read back ONCE after the whole trace. The only
    # per-segment host read is a 1-byte bins-fit flag (computed on device
    # in _pre_kernel_dev), which throttles the host to ~one segment behind
    # the device; the f16 binning snapshot is fetched ONLY on the segments
    # that actually rebind. With `mesh`, the same programs run
    # shard_mapped/GSPMD-partitioned over the 'rays' axis.
    # ----------------------------------------------------------------------
    # host-built constants device_put as transfers: jnp.arange/zeros/full
    # here would each mint a tiny eager XLA program (~0.5 s cold apiece)
    ident = jnp.asarray(np.arange(n_tot, dtype=np.int32))
    gperm_dev = ident
    inv_dev = ident
    tailed_dev = jnp.asarray(np.zeros(n_tot, bool))
    tail_state = jnp.asarray(np.zeros((n_tot, 8), np.float32))
    tail_seg = jnp.asarray(np.full(n_tot, -1, np.int32))
    n_retried = jnp.int32(0)
    rec_bases = np.concatenate(
        [[0], np.cumsum([r for _, r in plan])[:-1]])
    park_up = None

    def occ_stats(region, n_t, w):
        act = ~park_slots[region].reshape(n_t, w)
        tiles = int(act.any(1).sum())
        occ = float(act.sum()) / max(1, tiles * w)
        return tiles, round(occ, 4)

    cur_tiles = n_tl
    cur_shard_occ = np.full(n_shards, n_tl // n_shards, np.int64)
    shard_lane_steps = np.zeros(n_shards, np.int64)
    act_floor_dev = jnp.float32(0.0)
    all_dead = False
    last_recs = None
    dead_recs = {}
    for seg_i, (first_block, rps) in enumerate(plan):
        binres = next_bin
        next_bin = None
        if binres is not None:
            gperm_new, park_slots = binres
            occupied = n_tot - int(park_slots.sum())
            # occupancy-decay rebind floor: occupied slots at this binding
            act_floor_dev = jnp.float32(rebind_decay * occupied)
            # Every ray is out of the cube or tailed (a frozen ray can
            # never re-enter, so this is permanent): remaining segments
            # would each cost three tunnel dispatches + a flag read to
            # produce records that are just the final frozen row repeated
            # with S = 0 (inert to every consumer). Fabricate them instead.
            all_dead = occupied == 0 and last_recs is not None
            cur_tiles, o = occ_stats(slice(0, None), n_tl, rpt)
            stats.setdefault("tiles", []).append(cur_tiles)
            stats.setdefault("occ", []).append(o)
            if n_shards > 1:
                occ_t = ~park_slots.reshape(n_tl, rpt)
                cur_shard_occ = occ_t.any(1).reshape(
                    n_shards, n_tl // n_shards).sum(1)
            packed = gperm_new.astype(np.int32)
            packed[park_slots] |= np.int32(-0x80000000)
            gperm_dev, inv_dev, park_up, local_dev = _unpack_binning(
                jnp.asarray(packed), inv_dev)
        else:
            local_dev = ident
        # device-cycle ledger: occupied tiles run their full rpt lane width
        # for every step of the segment (all-parked tiles skip the loop);
        # per-shard totals expose SPMD load imbalance (straggler factor)
        seg_steps_i = first_block + (rps - 1) * record_stride
        stats.setdefault("seg_tiles", []).append(cur_tiles)
        stats.setdefault("seg_steps", []).append(seg_steps_i)
        shard_lane_steps += cur_shard_occ * (rpt * seg_steps_i)

        # the plan's final segment is padded to the uniform rps; only
        # n_real of its record rows are real — slice on yield (one eager
        # device slice on the last segment, vs a third Mosaic variant)
        n_real = min(rps, n_records - int(rec_bases[seg_i]))

        if all_dead:
            if rps not in dead_recs:
                dead_recs[rps] = _dead_record_block(last_recs, rps)
            yield (dead_recs[rps] if n_real == rps
                   else dead_recs[rps][:n_real])
            continue

        t0 = clock()
        horiz = (horizon(*plan[seg_i + 1])
                 if seg_i + 1 < len(plan) else 0.0)
        seg_start, klo, key16, park_dev, fit_dev, act_dev = \
            _pre_kernel_dev(
            state, local_dev, park_up, tailed_dev, gperm_dev, inv_dev,
            jnp.float32(horiz), cap6_dev, bounds2_dev, act_floor_dev,
            n_tl, rpt, n_rays)
        try:
            fit_dev.copy_to_host_async()
        except AttributeError:
            pass
        (state, recs, tailed_dev, tail_state, tail_seg, n_retried,
         _) = _segment_graph(
            tcube, scube, seg_start, klo, park_dev, tailed_dev,
            tail_state, tail_seg, n_retried, seg_i, gvec_dev, inv_dev,
            mesh, grid.shape, rpt, n_tl, rps,
            record_stride, first_block, float(dt), float(perturb_ratio),
            trace_crosssections, interpret, brick_lo, occ_r=occ_r,
            nch_s=nch_s)
        timers["enqueue"] += clock() - t0
        last_recs = recs
        yield recs if n_real == rps else recs[:n_real]

        if seg_i + 1 < len(plan):
            t0 = clock()
            fit = bool(np.asarray(fit_dev))
            timers["device_wait"] += clock() - t0
            if not fit:
                t0 = clock()
                for arr in (key16, act_dev):
                    try:
                        arr.copy_to_host_async()
                    except AttributeError:
                        pass
                # fetch the raw f16 and widen on the host: np.asarray with
                # a dtype would enqueue an eager device convert (a fresh
                # ~0.5 s XLA compile cold + a 2x bigger tunnel transfer)
                key_host = np.asarray(key16).astype(np.float32)
                act_host = np.asarray(act_dev)
                timers["snapshot_fetch"] += clock() - t0
                t0 = clock()
                next_bin = bin_rays(key_host, act_host,
                                    horizon(*plan[seg_i + 1]))
                timers["bin_host"] += clock() - t0

    if n_shards > 1:
        stats["shard_lane_steps"] = shard_lane_steps.tolist()
        mean_ls = max(1.0, float(shard_lane_steps.mean()))
        stats["straggler_factor"] = round(
            float(shard_lane_steps.max()) / mean_ls, 4)

    # single read-back of the tail carries
    t0 = clock()
    tail_seg_h = np.asarray(tail_seg)
    stats["retried"] = int(np.asarray(n_retried))
    tail_rows = np.flatnonzero(tail_seg_h >= 0)
    stats["escaped"] = len(tail_rows)
    if len(tail_rows):
        tail_state_h = np.asarray(tail_state)
        for k in np.unique(tail_seg_h[tail_rows]):
            ids = np.flatnonzero(tail_seg_h == k)
            stats["tails"].append(TailGroup(
                orig_ids=ids, state=tail_state_h[ids],
                rec_base=int(rec_bases[int(k)]),
                first_block=plan[int(k)][0]))
        if verbose:
            print(f"[pallas-trace] {stats['escaped']} rays left for "
                  f"the one-shot XLA tail "
                  f"({stats['retried']} fast-path ray retries)")
    timers["tail_readback"] += clock() - t0


def _pow2_at_least(n):
    return 1 << max(0, int(n - 1).bit_length())


def iter_tail_traces(stats, omega_pe_cube, ne_cube, te_cube, b_cube,
                     grid: UniformGrid, dt, record_stride,
                     trace_crosssections=True, perturb_ratio=2.0,
                     mesh=None, bvec=None):
    """One-shot XLA completion of rays that left the Pallas fast path.

    Consumes stats['tails'] from an exhausted iter_trace_segments and
    yields (orig_ids, rec_bases, recs) chunks where recs is a device
    (H, 8, bucket) record block shaped like the segment records: column j
    (< len(orig_ids)) holds ray orig_ids[j]'s records for the absolute
    record slots [rec_bases[j], rec_bases[j] + rem_j) with
    rem_j = n_records - rec_bases[j]; rows past rem_j carry S=0 (inert).
    Columns >= len(orig_ids) are padding.

    Shapes are bucketed (ray count in {2048, 16384}, horizon to the next
    power of two) so the XLA tracer compiles O(log) variants, and each
    escaped ray is integrated exactly once for its whole remaining horizon
    — the fixed cost of the fallback no longer scales with segment count.
    """
    tails = stats.get("tails") or []
    if not tails:
        return
    n_records = stats["n_records"]
    omega_pe_cube = jnp.asarray(omega_pe_cube, jnp.float32)
    trace_table = pack_trace_table(omega_pe_cube, grid)
    fields = [jnp.asarray(ne_cube, jnp.float32),
              jnp.asarray(te_cube, jnp.float32),
              jnp.asarray(b_cube, jnp.float32)]
    fill_vals = [FILL_NE, FILL_TE, FILL_B]
    if bvec is not None:
        fields += [jnp.asarray(c, jnp.float32) for c in bvec]
        fill_vals += [0.0, 0.0, 0.0]
    model_table = pack_fields(*fields)
    fills = jnp.array(fill_vals, jnp.float32)

    for fb in sorted({t.first_block for t in tails}):
        groups = [t for t in tails if t.first_block == fb]
        ids = np.concatenate([t.orig_ids for t in groups])
        states = np.concatenate([t.state for t in groups], axis=0)
        bases = np.concatenate([np.full(len(t.orig_ids), t.rec_base)
                                for t in groups])
        order = np.argsort(bases, kind="stable")   # similar horizons chunk
        ids, states, bases = ids[order], states[order], bases[order]

        for i in range(0, len(ids), 16384):
            ids_c = ids[i:i + 16384]
            states_c = states[i:i + 16384]
            bases_c = bases[i:i + 16384]
            m = len(ids_c)
            bucket = 256 if m <= 256 else (2048 if m <= 2048 else 16384)
            rem = n_records - bases_c
            horizon = min(_pow2_at_least(int(rem.max())), n_records)
            pad = bucket - m
            st = np.concatenate(
                [states_c, np.repeat(states_c[:1], pad, axis=0)], axis=0)
            rem_pad = np.concatenate([rem, np.zeros(pad, np.int64)])
            st = jnp.asarray(st)
            rem_pad = jnp.asarray(rem_pad, jnp.int32)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                st = jax.device_put(st, NamedSharding(mesh, P("rays", None)))
                rem_pad = jax.device_put(rem_pad,
                                         NamedSharding(mesh, P("rays")))
            recs = _trace_tail_chunk(
                trace_table, model_table, grid, st, rem_pad, fills,
                float(dt), int(fb), int(horizon), int(record_stride),
                bool(trace_crosssections), float(perturb_ratio))
            yield ids_c, bases_c, recs


@functools.partial(jax.jit, static_argnames=(
    "grid", "first_block", "horizon", "stride",
    "trace_crosssections", "perturb_ratio"))
def _trace_tail_chunk(trace_table, model_table, grid, st, rem, fills, dt,
                      first_block, horizon, stride, trace_crosssections,
                      perturb_ratio):
    """Trace one tail chunk on the XLA path and assemble stream-format
    records (H, 8, bucket); all work stays on device.

    The first record lands first_block steps in. Rather than passing
    first_block through trace_rays, the first_block-1 pre-record steps run
    as a separate record-free advance: the fused (first_block=stride,
    k_init, ~512 records) program shape deterministically kills the axon
    TPU worker, while the split shapes are stable."""
    pos, k, cums = st[:, 0:3], st[:, 3:6], st[:, 6]
    if first_block != 1:
        pre = trace_rays(trace_table, grid, 0.0, pos,
                         jnp.zeros_like(k), dt, first_block - 1,
                         first_block - 1, trace_crosssections,
                         perturb_ratio, "cumulative",
                         first_block=first_block - 1, k_init=k)
        pos = pre.final_state[:, 0:3]
        k = pre.final_state[:, 3:6]
        cums = cums * pre.s_record[-1]
    n_steps = 1 + (horizon - 1) * stride
    theta_los = model_table.shape[-1] >= 6
    res = trace_rays(trace_table, grid, 0.0, pos, jnp.zeros_like(k), dt,
                     n_steps, stride, trace_crosssections, perturb_ratio,
                     "cumulative", first_block=1, k_init=k,
                     record_k=theta_los)
    r_rec = res.r_record                               # (H, m, 3)
    s_rec = res.s_record * cums[None, :]               # cumS continuation

    def sample_row(r):
        # one record row at a time: a single gather over all H x m record
        # positions is large enough to crash the axon TPU worker
        vr, _ = trilinear_packed(model_table, grid, r[:, 0], r[:, 1],
                                 r[:, 2])
        return jnp.where(jnp.isfinite(vr), vr, fills)

    v = jax.lax.map(sample_row, r_rec)
    live = (jnp.arange(r_rec.shape[0], dtype=jnp.int32)[:, None]
            < rem[None, :])
    s_rec = jnp.where(live, s_rec, 0.0)
    if theta_los:
        # signed cos(theta) between the sampled B vector (fields 3:6) and
        # the INSTANTANEOUS wave vector at the record — the same definition
        # the fused kernel records in row 7 and the XLA pipeline uses, so a
        # tailed ray's theta stays consistent with its fast-path records
        from .sampler import cos_theta_signed
        cos_t = cos_theta_signed(res.k_record, v[..., 3:6])
    else:
        cos_t = jnp.zeros_like(s_rec)
    return jnp.concatenate([
        r_rec.transpose(0, 2, 1),                      # rows x, y, z
        s_rec[:, None, :],
        v[..., 0][:, None, :], v[..., 1][:, None, :], v[..., 2][:, None, :],
        cos_t[:, None, :]], axis=1)


def trace_rays_pallas(
    omega_pe_cube, ne_cube, te_cube, b_cube,
    grid: UniformGrid, freq_hz,
    start, kdir, dt, n_steps, record_stride=10,
    trace_crosssections=True, perturb_ratio=2.0,
    rpt=256, seg_records=25, interpret=False, verbose=False,
    bvec=None, brick=(BX, BY, BZ), tile_factor=4,
) -> PallasTraceResult:
    """Trace all rays with the fused Pallas kernel (cumulative-S semantics),
    assembling records on the host in original ray order. Records include
    Ne/Te/|B| sampled at the record positions; with `bvec` also the signed
    cos(theta(B, k̂)) per record."""
    n_rays = start.shape[0]
    stats = {}
    rec_host = None
    rec_base = 0
    for recs in iter_trace_segments(
            omega_pe_cube, ne_cube, te_cube, b_cube, grid, freq_hz,
            start, kdir, dt, n_steps, record_stride, trace_crosssections,
            perturb_ratio, rpt, seg_records, interpret, verbose, stats,
            bvec=bvec, brick=brick, tile_factor=tile_factor):
        rps = recs.shape[0]
        if rec_host is None:
            rec_host = np.zeros((stats["n_records"], n_rays, 8), np.float32)
        # columns past n_rays are tile-budget padding: drop before the host
        rec_host[rec_base:rec_base + rps] = (
            np.asarray(recs[:, :, :n_rays]).transpose(0, 2, 1))
        rec_base += rps

    n_records = stats["n_records"]
    for ids_c, bases_c, recs in iter_tail_traces(
            stats, omega_pe_cube, ne_cube, te_cube, b_cube, grid, dt,
            record_stride, trace_crosssections, perturb_ratio, bvec=bvec):
        recs_h = np.asarray(recs).transpose(0, 2, 1)   # (H, bucket, 8)
        for rb in np.unique(bases_c):
            sel = np.flatnonzero(bases_c == rb)
            rem = n_records - rb
            rec_host[rb:rb + rem, ids_c[sel]] = recs_h[:rem, sel]

    rec_host = rec_host[:, :n_rays, :]
    return PallasTraceResult(
        r_record=rec_host[:, :, 0:3],
        s_record=rec_host[:, :, 3],
        ne=rec_host[:, :, 4],
        te=rec_host[:, :, 5],
        b=rec_host[:, :, 6],
        escape_fraction=stats["escaped"] / max(1, n_rays),
        cos_theta=rec_host[:, :, 7] if bvec is not None else None,
    )
