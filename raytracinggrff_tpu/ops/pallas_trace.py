"""Fused Pallas TPU ray-trace kernel: VMEM cube bricks + MXU interpolation.

Why this exists: XLA:TPU lowers random gathers to a serial path measured at
~0.1-0.5 GB/s on v5e, making the gather-based tracer (tracer.py) ~200x slower
than the compute roofline. This kernel eliminates gathers entirely:

  * Rays are spatially binned into tiles of `rpt` rays (kd-median binned
    by the driver between segments). Each tile's kernel instance keeps
    a brick of the omega_pe(+gradients) cube in VMEM covering by nodes in
    y, bz nodes in z, and the FULL x axis, re-DMA-ing it from HBM when the
    tile's bounding box nears the brick edge. The x axis rides the
    lane dimension un-sliced (Mosaic requires lane-dim DMA slices to be
    128-aligned), so x motion never needs reloads or escapes.
  * Trilinear interpolation is evaluated gather-free with per-ray "tent"
    weight vectors w_j = max(0, 1-|l-j|): ONE MXU matmul contracts the
    fused (y, x) window axes against the per-ray outer-product weights
    wy (x) wx — (Bz*C, By*Bx) @ (By*Bx, rays) — and only the tiny
    z-contraction stays on the VPU. Folding y into the matmul matters:
    a VPU y-reduction costs by*bz*C*rays elements per evaluation (it was
    ~40% of per-lane cost and doubled with the brick's y extent, capping
    bricks at by=8), while MXU MACs are ~free at these sizes. The window
    is rearranged into the (Bz*C, By*Bx) layout once per brick reload
    (per-y-row lane rolls), not per step. The tent-weighted sum over
    in-range nodes is exactly the clamped trilinear interpolation of the
    reference CUDA kernel (gpu_raytrace.py:102-158).
  * Ne/Te/|B| are sampled at record time from a second brick, so the
    separate LOS sampling pass (and its gathers) disappears.

Cube layout: (ny, nz*4, nx) float32 — z fused with channels so brick DMAs
slice only leading dims; x innermost so the matmul contracts the lane axis
and every reshape merges/splits leading dims only (Mosaic cannot relayout a
sublane dim into lanes). Ray state is kept as separate per-component (R,)
vectors for the same reason.

Semantics match tracer.trace_rays with s_mode='cumulative' (the production
GPU-reference semantics, gpu_raytrace.py:398-408) for finite cubes (the
pipeline nan_to_nums them): frozen out-of-cube rays, cumulative
cross-section record, cross-section perturbed rays re-launched each step
from the central ray's previous state (build_rays.py:204-239).

Escape handling: rays that leave their tile's brick while still inside the
cube are frozen and flagged in the state's `esc` row; the driver removes
them from the fast path permanently and finishes them with one one-shot XLA
trace over their remaining horizon (driver: tracer_pallas.py). Tiles whose
rays are all frozen or out-of-cube skip the whole step loop.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import C_R, FILL_B, FILL_NE, FILL_TE
from ..grids import UniformGrid

BX = 32        # x-window nodes (MXU contraction: near-free up to ~32)
BY = 16        # brick nodes along y (MXU contraction since the fused-
#                (y,x) matmul; was the binding VPU cost at 8 before that)
BZ = 32        # brick nodes along z (VPU z-reduction + DMA rows). Rays fly
#                mostly along z, so the 6-col bin key's z-span (position +
#                predicted segment endpoint) is the binding capacity axis:
#                bz 16->32 measured late-phase occupancy 0.47->0.78 and
#                30->43M ray-steps/s on the canonical bench. VMEM stays
#                ~13.4M worst-case (nch_s=8) vs the 16M scoped limit;
#                by=32 or bz=64 would overflow it.
NCH = 4        # channels per cube (trace: wpe,gx,gy,gz; sample: ne,te,b,pad)
BZC = BZ * NCH  # fused z*channel extent of a brick
CHECK_EVERY = 4  # steps between brick-bounds checks; the reload margin
#                covers exactly this many steps of motion, so larger values
#                trade a slightly smaller usable brick for fewer bbox
#                reductions. 8 measured only +1.7% (within tunnel noise)
#                on the canonical TPU bench while growing the unrolled
#                step-group graph (interpret-mode test time +60%), so 4
#                stands. The driver's _brick_capacity reads this constant.


def _tent_weights(l, n_rows, rows):
    """Per-ray tent weights (rows, R): w[j, r] = max(0, 1 - |l[r] - j|).

    l is a (1, R) row vector (Mosaic-friendly 2D layout)."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, n_rows), 0).astype(
        jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(l - jj))


def _make_kernel(grid_shape, rpt, rps, stride, first_block,
                 perturb_ratio, trace_crosssections, nx_pad,
                 bx=BX, by=BY, bz=BZ, check_every=CHECK_EVERY, nch_s=NCH):
    nx, ny, nz = grid_shape
    fnx, fny, fnz = np.float32(nx - 1), np.float32(ny - 1), np.float32(nz - 1)
    c_r = np.float32(C_R)
    pr = np.float32(perturb_ratio)
    bzc = bz * NCH
    bzc_s = bz * nch_s
    # staging lane width: the per-y-row rolls that build the fused windows
    # slice their first by*bx lanes, so staging must be at least that wide
    w_pad = max(nx_pad, by * bx)

    def brick_sample(win_ref, lx, ly, lz, n_rows, nch=NCH):
        """Trilinear sample of a (bz*C, by*bx) fused-window at local
        coords (1, R) each. Returns nch (1, R) channel rows; out-of-window
        rows give 0.

        One matmul contracts the fused (y, x) axis against the per-ray
        outer-product weights wy (x) wx; the z-contraction is a small VPU
        reduction (bz*C*R elements — the by*bz*C*R y-reduction of the
        naive separable scheme is what used to dominate per-lane cost)."""
        wx = _tent_weights(lx, n_rows, bx)           # (bx, R)
        wy = _tent_weights(ly, n_rows, by)           # (by, R)
        wz = _tent_weights(lz, n_rows, bz)           # (bz, R)

        wxy = (wy[:, None, :] * wx[None, :, :]).reshape(by * bx, n_rows)
        t1 = jax.lax.dot_general(                    # (bz*C, R)
            win_ref[:], wxy, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t1 = t1.reshape(bz, nch, n_rows)             # fused axis is z-major
        t3 = jnp.sum(t1 * wz[:, None, :], axis=0)    # (C, R)
        return tuple(t3[c:c + 1] for c in range(nch))

    def kernel(par_ref, tcube, scube, state_in, state_out, rec_out,
               tbrick, sbrick, twin, swin, nrow, orig_ref, sem):
        state = state_in[0]                       # (8, rpt)
        # dt AND the grid origin/steps arrive as SMEM scalars so one
        # compiled kernel serves every step size and every cube EXTENT of
        # a given shape: the production TbSpectra sweep uses a distinct
        # (dt, grid_extent) per frequency (cli/tb_spectra.py presets), and
        # each value as a baked constant cost ~90 s of XLA+Mosaic
        # recompile per frequency. Only the cube SHAPE stays static.
        dt = par_ref[0]
        x0, y0, z0 = par_ref[1], par_ref[2], par_ref[3]
        inv_dx, inv_dy, inv_dz = par_ref[4], par_ref[5], par_ref[6]

        def to_frac(px, py, pz):
            return ((px - x0) * inv_dx, (py - y0) * inv_dy,
                    (pz - z0) * inv_dz)
        # Per-axis reload margin in cells: everything that can poke beyond
        # the ACTIVE bbox before the next bounds check — check_every steps
        # of motion (<= dt*C_R each), the cross-section perturbation offset
        # (pr * step) and the perturbed ray's own step, PLUS one step for
        # the software-pipelined perturbed pair (it is launched from the
        # main ray's PREVIOUS position, see step_merged) — plus one cell
        # for the trailing interpolation node. Without this margin,
        # coherent bundles escape between checks (measured 98% tail-out on
        # a 300 MHz straight-through workload with the old fixed 1-cell
        # margin). check_every > 1 trades a slightly smaller usable brick
        # for skipping the bbox reductions + scalar-unit conditional most
        # steps.
        reach = ((pr + 2.0 + check_every) if trace_crosssections
                 else (1.0 + check_every)) * dt * c_r
        marg_x = 1.0 + reach * inv_dx
        marg_y = 1.0 + reach * inv_dy
        marg_z = 1.0 + reach * inv_dz

        orig_ref[0] = jnp.int32(-10000)           # ox; force initial load
        orig_ref[1] = jnp.int32(-10000)           # oy
        orig_ref[2] = jnp.int32(-10000)           # oz

        def origins_f():
            return (orig_ref[0].astype(jnp.float32),
                    orig_ref[1].astype(jnp.float32),
                    orig_ref[2].astype(jnp.float32))

        def inbounds(fx, fy, fz):
            return ((fx >= 0) & (fx <= fnx) & (fy >= 0) & (fy <= fny)
                    & (fz >= 0) & (fz <= fnz))

        def maybe_reload(px, py, pz, esc):
            """Re-center the brick on the active rays' bbox when needed.

            y/z re-center triggers a DMA from HBM (full x extent); the
            8-node x-window is then re-extracted from the staged brick with
            a dynamic lane rotate — no lane-aligned DMA slicing needed."""
            fx, fy, fz = to_frac(px, py, pz)
            active = inbounds(fx, fy, fz) & (esc < 0.5)
            any_active = jnp.any(active)
            big = jnp.float32(1e9)

            def mms(f):
                return (jnp.min(jnp.where(active, f, big)),
                        jnp.max(jnp.where(active, f, -big)))

            xmin, xmax = mms(fx)
            ymin, ymax = mms(fy)
            zmin, zmax = mms(fz)
            ox, oy, oz = origins_f()
            lo_x, hi_x = xmin - ox, xmax - ox
            lo_y, hi_y = ymin - oy, ymax - oy
            lo_z, hi_z = zmin - oz, zmax - oz
            need = any_active & (
                (lo_x < marg_x) | (hi_x > bx - 1.0 - marg_x)
                | (lo_y < marg_y) | (hi_y > by - 1.0 - marg_y)
                | (lo_z < marg_z) | (hi_z > bz - 1.0 - marg_z))

            @pl.when(need)
            def _():
                def center(mn, mx, n, bw, align=1):
                    c = 0.5 * (jnp.maximum(mn, 0.0)
                               + jnp.minimum(mx, np.float32(n - 1)))
                    # bw > n (brick wider than the cube, x only: y/z are
                    # pre-shrunk by the driver's fit_brick) -> origin 0;
                    # clip(x, 0, n-bw) with n-bw < 0 would yield a NEGATIVE
                    # origin and shift window reads into the staging
                    # buffer's uninitialized tail lanes
                    o = jnp.clip((c - bw / 2 + 0.5).astype(jnp.int32),
                                 0, max(n - bw, 0))
                    # the cube DMA slices dim 1 at origin*nch: Mosaic must
                    # prove that offset divisible by the sublane tile (8),
                    # so for nch < 8 the z origin is rounded down to a
                    # multiple of 8/nch (shape-dependent otherwise: nz=128
                    # happened to compile, the production 256^3 low-band
                    # grid did not). Rounding down stays >= 0 and costs at
                    # most align-1 cells of usable margin (the driver's
                    # _brick_capacity budgets for it).
                    return o & ~jnp.int32(align - 1) if align > 1 else o

                nox = center(xmin, xmax, nx, bx)
                noy = center(ymin, ymax, ny, by)
                zalign = max(1, 8 // min(NCH, nch_s))
                noz = center(zmin, zmax, nz, bz, align=zalign)
                orig_ref[0] = nox
                orig_ref[1] = noy
                orig_ref[2] = noz
                def zstart(orig, nch):
                    # express the dim-1 slice offset as <quotient> * 8 so
                    # Mosaic's divisibility prover accepts it against the
                    # (8, 128) sublane tiling — orig*nch alone is only
                    # provably divisible by nch (`orig` is rounded to a
                    # multiple of 8/nch above, so the floor-div is exact)
                    al = max(1, 8 // nch)
                    return (orig // al) * (al * nch)

                dst1 = tbrick if w_pad == nx_pad \
                    else tbrick.at[:, :, pl.ds(0, nx_pad)]
                cp1 = pltpu.make_async_copy(
                    tcube.at[pl.ds(noy, by), pl.ds(zstart(noz, NCH), bzc),
                             :],
                    dst1, sem)
                cp1.start()
                cp1.wait()
                dst2 = sbrick if w_pad == nx_pad \
                    else sbrick.at[:, :, pl.ds(0, nx_pad)]
                cp2 = pltpu.make_async_copy(
                    scube.at[pl.ds(noy, by),
                             pl.ds(zstart(noz, nch_s), bzc_s), :],
                    dst2, sem)
                cp2.start()
                cp2.wait()

                def fuse_window(brick, rows):
                    """(by, rows, w_pad) staged brick -> (rows, by*bx)
                    window: per-y-row lane roll places y's x-window at lane
                    block [y*bx, (y+1)*bx) (lane l of block y reads staged
                    lane nox + (l - y*bx), always < nx_pad). Runs only at
                    reload, so the matmul's fused (y, x) layout costs
                    nothing per step."""
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, by * bx), 1)
                    acc = jnp.zeros((rows, by * bx), jnp.float32)
                    for y in range(by):
                        rolled = pltpu.roll(
                            brick[y], y * bx - nox, axis=1)[:, :by * bx]
                        m = (lane >= y * bx) & (lane < (y + 1) * bx)
                        acc = jnp.where(m, rolled, acc)
                    return acc

                twin[:] = fuse_window(tbrick, bzc)
                swin[:] = fuse_window(sbrick, bzc_s)

        def local_xyz(fx, fy, fz):
            ox, oy, oz = origins_f()
            return fx - ox, fy - oy, fz - oz

        def rhs(px, py, pz, kx, ky, kz, esc_flags):
            """Batched ODE RHS. All args (R,). Returns (dr3, dk3, esc')."""
            n_rows = px.shape[1]
            fx, fy, fz = to_frac(px, py, pz)
            lx, ly, lz = local_xyz(fx, fy, fz)
            inb = inbounds(fx, fy, fz)
            in_brick = ((lx >= 0) & (lx <= bx - 1) & (ly >= 0)
                        & (ly <= by - 1) & (lz >= 0) & (lz <= bz - 1))
            esc_new = esc_flags | (inb & ~in_brick)

            wpe, gx, gy, gz = brick_sample(twin, lx, ly, lz, n_rows)
            om = jnp.sqrt(jnp.maximum(
                wpe * wpe + kx * kx + ky * ky + kz * kz, 0.0))
            ok = inb & in_brick & (om > 0)
            okf = ok.astype(jnp.float32)
            inv_om = okf / jnp.where(om > 0, om, 1.0)
            cr_iom = c_r * inv_om
            a = -wpe * inv_om * c_r
            return ((cr_iom * kx, cr_iom * ky, cr_iom * kz),
                    (a * gx * okf, a * gy * okf, a * gz * okf), esc_new)

        def rk4(px, py, pz, kx, ky, kz, esc_flags):
            p = (px, py, pz)
            k = (kx, ky, kz)

            def at(pc, kc, h):
                return tuple(p[i] + h * pc[i] for i in range(3)), \
                       tuple(k[i] + h * kc[i] for i in range(3))

            d1r, d1k, e = rhs(*p, *k, esc_flags)
            p2_, k2_ = at(d1r, d1k, 0.5 * dt)
            d2r, d2k, e = rhs(*p2_, *k2_, e)
            p3_, k3_ = at(d2r, d2k, 0.5 * dt)
            d3r, d3k, e = rhs(*p3_, *k3_, e)
            p4_, k4_ = at(d3r, d3k, dt)
            d4r, d4k, e = rhs(*p4_, *k4_, e)
            c = dt / 6.0
            pn = tuple(p[i] + c * (d1r[i] + 2 * d2r[i] + 2 * d3r[i]
                                   + d4r[i]) for i in range(3))
            kn = tuple(k[i] + c * (d1k[i] + 2 * d2k[i] + 2 * d3k[i]
                                   + d4k[i]) for i in range(3))
            return pn, kn, e

        def cross(a, b):
            return (a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0])

        # ------------------------------------------------------------------
        # Cross-section tracking is SOFTWARE-PIPELINED one interval deep:
        # the perturbed pair for interval j (launched from the main ray's
        # pre-step position with offsets from the REALIZED step direction,
        # build_rays.py:204-239) is integrated INSIDE the same 3*rpt-lane
        # rk4 call as the main ray's interval j+1, and its cross-section
        # ratio is folded into cumS right after that call. The serial
        # ordering (4 main evals at rpt lanes, then 4 perturbed evals at
        # 2*rpt) costs 8 matmul latencies per step; the merged call costs
        # 4 — and per-tile step cost is matmul-LATENCY-dominated at these
        # widths, so this is a ~1.6x kernel speedup. Record values are
        # exactly the serial ones (each record's cumS is flushed complete
        # before it is written); the only divergence is the end state of
        # rays whose PERTURBED ray escaped the brick — they freeze one
        # step later than the serial schedule, and every escapee's state
        # and records are recomputed from the segment start by the
        # driver's retry/tail path anyway (tracer_pallas._retry_graph).
        # ------------------------------------------------------------------

        def build_pert(p_old, k_old, pn, frozen):
            """Launch state for the perturbed pair of interval
            p_old -> pn, plus the fold context (t_hat, eps, frozen-at-
            launch). All rows (1, rpt): the two perturbed rays stay as
            separate equal-width rows because Mosaic only concatenates
            equal-shaped vectors on the lane dim."""
            rd = (pn[0] - p_old[0], pn[1] - p_old[1], pn[2] - p_old[2])
            dnorm = jnp.sqrt(rd[0] * rd[0] + rd[1] * rd[1]
                             + rd[2] * rd[2]) + 1e-32
            t_hat = (rd[0] / dnorm, rd[1] / dnorm, rd[2] / dnorm)
            # transverse basis (gpu_raytrace.py:284-295)
            use_z = jnp.abs(t_hat[2]) < 0.9
            ay = jnp.where(use_z, 0.0, 1.0)
            az = jnp.where(use_z, 1.0, 0.0)
            e1 = (ay * t_hat[2] - az * t_hat[1],
                  az * t_hat[0], -ay * t_hat[0])
            n1 = jnp.sqrt(e1[0] * e1[0] + e1[1] * e1[1]
                          + e1[2] * e1[2]) + 1e-30
            e1 = (e1[0] / n1, e1[1] / n1, e1[2] / n1)
            e2 = cross(t_hat, e1)
            n2 = jnp.sqrt(e2[0] * e2[0] + e2[1] * e2[1]
                          + e2[2] * e2[2]) + 1e-30
            e2 = (e2[0] / n2, e2[1] / n2, e2[2] / n2)
            eps = pr * dnorm
            q1 = tuple(p_old[i] + eps * e1[i] for i in range(3))
            q2 = tuple(p_old[i] + eps * e2[i] for i in range(3))
            # frozen carried as f32: Mosaic cannot legalize i1 vectors in
            # fori_loop carries (scf.for legalization failure on v5e)
            return q1 + q2 + tuple(k_old) + t_hat \
                + (eps, frozen.astype(jnp.float32))

        def fold_pert(pend, pert_n, e_p2, p_end, cums, esc):
            """Fold the pending interval's cross-section ratio into cumS.
            pert_n: (1, 2*rpt) integrated perturbed positions; p_end: the
            main ray's position at that interval's END (= the carry value
            BEFORE the current iteration's main update)."""
            thx, thy, thz, eps, fzp = pend[9:]
            d1 = tuple(pert_n[i][:, :rpt] - p_end[i] for i in range(3))
            d2 = tuple(pert_n[i][:, rpt:] - p_end[i] for i in range(3))
            cr = cross(d1, d2)
            num = jnp.abs(cr[0] * thx + cr[1] * thy + cr[2] * thz)
            s_ratio = num / (eps * eps + 1e-30)
            cums = jnp.where(fzp > 0.5, cums, cums * s_ratio)
            e_p = e_p2[:, :rpt] | e_p2[:, rpt:]
            esc = jnp.maximum(esc, e_p.astype(jnp.float32))
            return cums, esc

        def main_step(carry, check_reload=True):
            """Block-leading step: main ray only, opens the pipeline."""
            px, py, pz, kx, ky, kz, cums, esc = carry
            if check_reload:
                maybe_reload(px, py, pz, esc)
            frozen = esc > 0.5
            pn, kn, e_c = rk4(px, py, pz, kx, ky, kz,
                              jnp.zeros((1, rpt), bool))
            pend = build_pert((px, py, pz), (kx, ky, kz), pn, frozen)
            px = jnp.where(frozen, px, pn[0])
            py = jnp.where(frozen, py, pn[1])
            pz = jnp.where(frozen, pz, pn[2])
            kx = jnp.where(frozen, kx, kn[0])
            ky = jnp.where(frozen, ky, kn[1])
            kz = jnp.where(frozen, kz, kn[2])
            esc = jnp.maximum(esc, e_c.astype(jnp.float32))
            return (px, py, pz, kx, ky, kz, cums, esc), pend

        def step_merged(cp, check_reload=True):
            """One pipelined step: main interval j+1 and the pending
            perturbed pair of interval j in a single 3*rpt-lane rk4."""
            carry, pend = cp
            px, py, pz, kx, ky, kz, cums, esc = carry
            if check_reload:
                maybe_reload(px, py, pz, esc)
            frozen = esc > 0.5
            mx = jnp.concatenate([px, pend[0], pend[3]], axis=1)
            my = jnp.concatenate([py, pend[1], pend[4]], axis=1)
            mz = jnp.concatenate([pz, pend[2], pend[5]], axis=1)
            mkx = jnp.concatenate([kx, pend[6], pend[6]], axis=1)
            mky = jnp.concatenate([ky, pend[7], pend[7]], axis=1)
            mkz = jnp.concatenate([kz, pend[8], pend[8]], axis=1)
            res_p, res_k, e_m = rk4(mx, my, mz, mkx, mky, mkz,
                                    jnp.zeros((1, 3 * rpt), bool))
            pn = tuple(r[:, :rpt] for r in res_p)
            kn = tuple(r[:, :rpt] for r in res_k)
            pert_n = tuple(r[:, rpt:] for r in res_p)
            e_c = e_m[:, :rpt]
            cums, esc = fold_pert(pend, pert_n, e_m[:, rpt:],
                                  (px, py, pz), cums, esc)
            pend = build_pert((px, py, pz), (kx, ky, kz), pn, frozen)
            px = jnp.where(frozen, px, pn[0])
            py = jnp.where(frozen, py, pn[1])
            pz = jnp.where(frozen, pz, pn[2])
            kx = jnp.where(frozen, kx, kn[0])
            ky = jnp.where(frozen, ky, kn[1])
            kz = jnp.where(frozen, kz, kn[2])
            esc = jnp.maximum(esc, e_c.astype(jnp.float32))
            return (px, py, pz, kx, ky, kz, cums, esc), pend

        def flush_pert(cp):
            """Close the pipeline at a record boundary: integrate the last
            pending perturbed pair (2*rpt lanes) and fold its ratio, so
            the record's cumS is complete through the block's last step."""
            carry, pend = cp
            px, py, pz, kx, ky, kz, cums, esc = carry
            qx = jnp.concatenate([pend[0], pend[3]], axis=1)
            qy = jnp.concatenate([pend[1], pend[4]], axis=1)
            qz = jnp.concatenate([pend[2], pend[5]], axis=1)
            qkx = jnp.concatenate([pend[6], pend[6]], axis=1)
            qky = jnp.concatenate([pend[7], pend[7]], axis=1)
            qkz = jnp.concatenate([pend[8], pend[8]], axis=1)
            pert_n0, _, e_p2 = rk4(qx, qy, qz, qkx, qky, qkz,
                                   jnp.zeros((1, 2 * rpt), bool))
            cums, esc = fold_pert(pend, pert_n0, e_p2,
                                  (px, py, pz), cums, esc)
            return (px, py, pz, kx, ky, kz, cums, esc)

        def step_plain(carry, check_reload=True):
            """No-cross-section step (trace_crosssections=False)."""
            px, py, pz, kx, ky, kz, cums, esc = carry
            if check_reload:
                maybe_reload(px, py, pz, esc)
            frozen = esc > 0.5
            pn, kn, e_c = rk4(px, py, pz, kx, ky, kz,
                              jnp.zeros((1, rpt), bool))
            px = jnp.where(frozen, px, pn[0])
            py = jnp.where(frozen, py, pn[1])
            pz = jnp.where(frozen, pz, pn[2])
            kx = jnp.where(frozen, kx, kn[0])
            ky = jnp.where(frozen, ky, kn[1])
            kz = jnp.where(frozen, kz, kn[2])
            esc = jnp.maximum(esc, e_c.astype(jnp.float32))
            return px, py, pz, kx, ky, kz, cums, esc

        def record(b_idx, carry):
            px, py, pz, kx, ky, kz, cums, esc = carry
            fx, fy, fz = to_frac(px, py, pz)
            lx, ly, lz = local_xyz(fx, fy, fz)
            sv = brick_sample(swin, lx, ly, lz, rpt, nch=nch_s)
            ne_v, te_v, b_v = sv[0], sv[1], sv[2]
            inb = inbounds(fx, fy, fz)
            in_brick = ((lx >= 0) & (lx <= bx - 1) & (ly >= 0)
                        & (ly <= by - 1) & (lz >= 0) & (lz <= bz - 1))
            good = inb & in_brick
            ne_v = jnp.where(good, ne_v, np.float32(FILL_NE))
            te_v = jnp.where(good, te_v, np.float32(FILL_TE))
            b_v = jnp.where(good, b_v, np.float32(FILL_B))
            esc = jnp.maximum(esc, (inb & ~in_brick).astype(jnp.float32))
            if nch_s >= 6:
                # channels 3:6 carry the image-frame Cartesian B vector:
                # record the SIGNED cos(theta) between B and the local wave
                # vector (theta_mode='los'; Parms[4] per-voxel contract)
                bvx, bvy, bvz = sv[3], sv[4], sv[5]
                bdk = bvx * kx + bvy * ky + bvz * kz
                bn = jnp.sqrt(bvx * bvx + bvy * bvy + bvz * bvz)
                kn = jnp.sqrt(kx * kx + ky * ky + kz * kz)
                cos_t = bdk / jnp.maximum(bn * kn, np.float32(1e-30))
                last = jnp.where(good, jnp.clip(cos_t, -1.0, 1.0), 0.0)
            else:
                last = jnp.zeros_like(px)
            rec = jnp.concatenate([px, py, pz, cums, ne_v, te_v, b_v,
                                   last], axis=0)
            rec_out[0, pl.ds(b_idx, 1)] = rec[None]
            return px, py, pz, kx, ky, kz, cums, esc

        def run_block(carry, n_steps, b_idx):
            # bounds check every check_every steps; the reload margin
            # (marg_*) covers exactly that many steps of motion plus the
            # perturbation reach (incl. the pipeline's one-step lag), so
            # nothing can leave the brick between checks. The DMA only
            # fires when the margin is breached.
            if trace_crosssections:
                cp = main_step(carry)                      # opens pipeline
                nc, rem = divmod(n_steps - 1, check_every)

                def group(_, cp):
                    cp = step_merged(cp, check_reload=True)
                    for _ in range(check_every - 1):
                        cp = step_merged(cp, check_reload=False)
                    return cp

                if nc:
                    cp = jax.lax.fori_loop(0, nc, group, cp)
                for j in range(rem):
                    cp = step_merged(cp, check_reload=(j == 0))
                carry = flush_pert(cp)
            else:
                nc, rem = divmod(n_steps, check_every)

                def group(_, c):
                    c = step_plain(c, check_reload=True)
                    for _ in range(check_every - 1):
                        c = step_plain(c, check_reload=False)
                    return c

                if nc:
                    carry = jax.lax.fori_loop(0, nc, group, carry)
                for j in range(rem):
                    carry = step_plain(carry, check_reload=(j == 0))
            return record(b_idx, carry)

        # Tiles whose rays are all frozen (escaped/tailed) or out-of-cube
        # are skipped outright: the driver parks such rays into trailing
        # bins, so kernel work shrinks as rays finish or leave the fast
        # path. Skipped tiles pass state through and emit inert records
        # (frozen positions, S=0, fill-value fields) that downstream
        # consumers treat as no-ops.
        fx0, fy0, fz0 = to_frac(state[0:1], state[1:2], state[2:3])
        has_active = jnp.any(inbounds(fx0, fy0, fz0) & (state[7:8] < 0.5))

        @pl.when(has_active)
        def _():
            # Round-trip each state row through a (1, rpt) scratch: a
            # direct state[i:i+1] slice carries sublane-offset-i layout,
            # which poisons every downstream select/max and makes Mosaic
            # reject step_merged's lane concat of carry rows with
            # arithmetic (offset-0) perturbation rows ("result/input
            # offset mismatch on non-concat dimension"). The store
            # re-anchors each row to the scratch ref's offset-0 layout.
            def norm_row(i):
                nrow[:] = state[i:i + 1]
                return nrow[:]

            carry = tuple(norm_row(i) for i in range(8))
            if first_block == stride:
                carry = jax.lax.fori_loop(
                    0, rps, lambda b, c: run_block(c, stride, b), carry)
            else:
                carry = run_block(carry, first_block, 0)
                if rps > 1:
                    carry = jax.lax.fori_loop(
                        1, rps, lambda b, c: run_block(c, stride, b), carry)
            state_out[0] = jnp.concatenate(carry, axis=0)

        @pl.when(jnp.logical_not(has_active))
        def _():
            state_out[0] = state
            rec = jnp.concatenate([
                state[0:3], jnp.zeros((1, rpt), jnp.float32),
                jnp.full((1, rpt), np.float32(FILL_NE)),
                jnp.full((1, rpt), np.float32(FILL_TE)),
                jnp.full((1, rpt), np.float32(FILL_B)),
                jnp.zeros((1, rpt), jnp.float32)], axis=0)

            def wr(b, c):
                rec_out[0, pl.ds(b, 1)] = rec[None]
                return c

            jax.lax.fori_loop(0, rps, wr, 0)

    return kernel


class PallasSegmentResult(NamedTuple):
    state: jax.Array      # (n_tiles, 8, rpt)
    records: jax.Array    # (n_tiles, rps, 8, rpt)


def grid_param_vec(grid: UniformGrid):
    """Dynamic kernel grid parameters [x0, y0, z0, 1/dx, 1/dy, 1/dz].

    Riding as SMEM scalars (with dt prepended by run_trace_segment) so a
    compiled kernel is keyed on the cube SHAPE only — the TbSpectra sweep
    interpolates grid_extent continuously per frequency, and extent as a
    static key made every frequency its own Mosaic compile."""
    return np.concatenate([np.asarray(grid.origin, np.float32),
                           np.asarray(grid.inv_steps, np.float32)])


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "rpt", "rps", "stride", "first_block",
                     "perturb_ratio", "trace_crosssections", "interpret",
                     "bx", "by", "bz", "sample_channels"))
def run_trace_segment(tcube, scube, state, gvec, grid_shape, rpt, rps,
                      stride, first_block, dt, perturb_ratio,
                      trace_crosssections=True, interpret=False,
                      bx=BX, by=BY, bz=BZ, sample_channels=NCH):
    """Run one trace segment: `rps` record-blocks over all ray tiles.

    tcube/scube: (ny, nz*C, nx) fused-layout cubes (see pack_cube_zc);
    scube carries `sample_channels` channels (4: ne,te,b,pad — or 8:
    ne,te,b,bx,by,bz,pad,pad for theta_mode='los').
    state: (n_tiles, 8, rpt) rows [rx,ry,rz,kx,ky,kz,cumS,escaped].
    gvec: grid_param_vec(grid) (dynamic); grid_shape: grid.shape (static).
    Records rows: [x, y, z, S, ne, te, b, cos_theta(B,k) or 0].
    bx/by/bz select the brick size: the (y, x) extents ride the MXU
    contraction (bz*NCH x by*bx MACs per ray per sample — near-free at
    these sizes), bz rides the small VPU z-reduction, so moderately large
    bricks track spatially diffuse bundles at little extra cost.
    """
    n_tiles = state.shape[0]
    nx_pad = tcube.shape[2]
    _, gny, gnz = grid_shape
    if by > gny or bz > gnz:
        # the y/z brick axes are DMA-sliced out of the cube, so a brick
        # taller than the cube reads out of range (silently, on hardware);
        # the driver pre-shrinks via fit_brick — direct callers must too
        raise ValueError(
            f"brick (by={by}, bz={bz}) exceeds cube "
            f"(ny={gny}, nz={gnz}); shrink the brick y/z")
    bzc = bz * NCH
    bzc_s = bz * sample_channels
    w_pad = max(nx_pad, by * bx)
    dt_arr = jnp.concatenate([
        jnp.reshape(jnp.asarray(dt, jnp.float32), (1,)),
        jnp.asarray(gvec, jnp.float32)])
    kernel = _make_kernel(grid_shape, rpt, rps, stride, first_block,
                          float(perturb_ratio), trace_crosssections, nx_pad,
                          bx, by, bz, nch_s=sample_channels)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, rpt), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, rpt), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rps, 8, rpt), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, rpt), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, rps, 8, rpt), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((by, bzc, w_pad), jnp.float32),   # full-x staging
            pltpu.VMEM((by, bzc_s, w_pad), jnp.float32),
            pltpu.VMEM((bzc, by * bx), jnp.float32),     # fused (y,x) windows
            pltpu.VMEM((bzc_s, by * bx), jnp.float32),
            pltpu.VMEM((1, rpt), jnp.float32),           # row relayout
            pltpu.SMEM((3,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dt_arr, tcube, scube, state)
    return PallasSegmentResult(state=out[0], records=out[1])


def pack_cube_zc(*channels, nch=NCH):
    """Pack up to `nch` cubes (nx,ny,nz) into the (ny, nz*nch, nx_pad)
    kernel layout: x innermost (so brick contractions avoid lane-dim
    reshapes) and zero-padded to a multiple of 128 (Mosaic requires
    lane-dim DMA slices to be 128-aligned; padded nodes get zero tent
    weight for any in-cube ray)."""
    cubes = [jnp.asarray(c, jnp.float32) for c in channels]
    if len(cubes) > nch:
        raise ValueError(f"{len(cubes)} channels > nch={nch}")
    while len(cubes) < nch:
        cubes.append(jnp.zeros_like(cubes[0]))
    stacked = jnp.stack(cubes, axis=-1)          # (nx, ny, nz, nch)
    nx, ny, nz, _ = stacked.shape
    out = jnp.transpose(stacked, (1, 2, 3, 0)).reshape(ny, nz * nch, nx)
    nx_pad = -(-nx // 128) * 128
    if nx_pad != nx:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, nx_pad - nx)))
    return out


def _pack_chunks_zc(chunk_channels, nx, ny, nz, nch, chunk):
    """Stream (nx, ck, nz, nch) y-chunks from `chunk_channels(y0, ck)` into
    the (ny, nz*nch, nx_pad) kernel layout with one fori_loop carrying the
    output buffer (XLA updates it in place). When ny % ck != 0 the last
    chunk's start is clamped to ny - ck and the overlapping rows are
    rewritten with identical values."""
    nx_pad = -(-nx // 128) * 128
    ck = min(chunk, ny)
    n_chunks = -(-ny // ck)
    out = jnp.zeros((ny, nz * nch, nx_pad), jnp.float32)

    def body(i, out):
        y0 = jnp.minimum(i * ck, ny - ck)
        st = chunk_channels(y0, ck)                  # (nx, ck, nz, nch)
        blk = jnp.transpose(st, (1, 2, 3, 0)).reshape(ck, nz * nch, nx)
        if nx_pad != nx:
            blk = jnp.pad(blk, ((0, 0), (0, 0), (0, nx_pad - nx)))
        return jax.lax.dynamic_update_slice(out, blk, (y0, 0, 0))

    return jax.lax.fori_loop(0, n_chunks, body, out)


@functools.partial(jax.jit, static_argnames=("grid", "chunk"))
def pack_trace_cube_zc(omega_pe_cube, grid: UniformGrid, chunk=8):
    """omega_pe + its central-difference gradients packed straight into the
    (ny, nz*NCH, nx_pad) kernel layout, streamed in y-chunks.

    Functionally pack_cube_zc(wpe, *gradient_cubes(wpe, grid)) (the
    np.gradient parity contract, ref build_rays.py:136-138), but with a
    bounded transient footprint: the fused one-jit setup graph
    materializes three gradient cubes plus stack/transpose copies — ~5
    extra cube-sized buffers — which OOMed the 16 GB chip at 576^3 with
    the scene cubes resident (the TbSpectra sweep's 714 MHz frame). Here
    the only full-size allocations are one edge-extrapolated copy of the
    input and the packed output; per-chunk transients are ~chunk/ny of a
    cube. The linear edge extrapolation (f[-1] := 2 f[0] - f[1]) makes
    the central difference at a boundary node equal np.gradient's
    one-sided difference there.
    """
    cube = jnp.asarray(omega_pe_cube, jnp.float32)
    nx, ny, nz = cube.shape

    def pad_axis(f, ax):
        first = (2.0 * jax.lax.index_in_dim(f, 0, ax)
                 - jax.lax.index_in_dim(f, 1, ax))
        last = (2.0 * jax.lax.index_in_dim(f, f.shape[ax] - 1, ax)
                - jax.lax.index_in_dim(f, f.shape[ax] - 2, ax))
        return jnp.concatenate([first, f, last], axis=ax)

    cpad = pad_axis(pad_axis(pad_axis(cube, 0), 1), 2)
    hx = jnp.float32(2.0 * grid.dx)
    hy = jnp.float32(2.0 * grid.dy)
    hz = jnp.float32(2.0 * grid.dz)

    def chunk_channels(y0, ck):
        slab = jax.lax.dynamic_slice(cpad, (0, y0, 0),
                                     (nx + 2, ck + 2, nz + 2))
        w = slab[1:-1, 1:-1, 1:-1]
        gx = (slab[2:, 1:-1, 1:-1] - slab[:-2, 1:-1, 1:-1]) / hx
        gy = (slab[1:-1, 2:, 1:-1] - slab[1:-1, :-2, 1:-1]) / hy
        gz = (slab[1:-1, 1:-1, 2:] - slab[1:-1, 1:-1, :-2]) / hz
        return jnp.stack([w, gx, gy, gz], axis=-1)

    return _pack_chunks_zc(chunk_channels, nx, ny, nz, NCH, chunk)


@functools.partial(jax.jit, static_argnames=("nch", "chunk"))
def pack_sample_cube_zc(*channels, nch=NCH, chunk=8):
    """pack_cube_zc with a bounded transient footprint (see
    pack_trace_cube_zc): a pure relayout streamed in y-chunks, so the only
    full-size allocation beyond the inputs is the packed output."""
    cubes = [jnp.asarray(c, jnp.float32) for c in channels]
    if len(cubes) > nch:
        raise ValueError(f"{len(cubes)} channels > nch={nch}")
    nx, ny, nz = cubes[0].shape
    n_real = len(cubes)

    def chunk_channels(y0, ck):
        slabs = [jax.lax.dynamic_slice(c, (0, y0, 0), (nx, ck, nz))
                 for c in cubes]
        slabs += [jnp.zeros_like(slabs[0])] * (nch - n_real)
        return jnp.stack(slabs, axis=-1)

    return _pack_chunks_zc(chunk_channels, nx, ny, nz, nch, chunk)
