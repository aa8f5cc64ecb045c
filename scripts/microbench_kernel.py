#!/usr/bin/env python
"""Microbenchmark of the Pallas trace kernel: per-lane-step cost vs
(rpt lanes, brick shape), by the SLOPE method.

Each config is timed at two record counts (rps and 2*rps) with identical
shapes otherwise; the difference isolates the step-loop cost from the
axon tunnel's ~0.1 s per-launch round-trip latency (which swamped naive
per-launch timing: a 0.1 s wall on a 20k-tile-step launch reads as a
phantom 5 us/tile-step fixed cost).

Default rays MOVE at the physical speed (|k| = omega at 75 MHz), so the
slope includes the brick-reload DMA + window-rebuild cost the production
trace pays; --stationary freezes them (k=0) for the pure-compute floor.
The two differ by ~15% at the canonical config (21.8 vs 18.5 ns) — the
round-4/5 "10.5 ns roofline" was a stationary slope of a SMALLER brick
config, and comparing it against the canonical (32,16,32)-brick run
manufactured a phantom "40% unaccounted overhead" (the canonical kernel
simply costs ~21 ns/lane-step: the fused (y,x) MXU contraction scales
with brick volume, ~75 f32 TFLOP/s sustained — near the v5e f32 peak).

Usage: python scripts/microbench_kernel.py [--configs "128:16,8,16 ..."]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-tiles", type=int, default=512)
    p.add_argument("--rps", type=int, default=8)
    p.add_argument("--stride", type=int, default=10)
    p.add_argument("--grid-n", type=int, default=128)
    p.add_argument("--repeat", type=int, default=5)
    p.add_argument(
        "--configs",
        default="128:32,16,32 128:16,8,16 256:32,16,16 512:32,16,16 "
                "512:32,8,16 256:32,8,16",
        help="space-separated rpt:bx,by,bz entries (canonical first)")
    p.add_argument("--stationary", action="store_true",
                   help="freeze rays (k=0): pure-compute floor without "
                        "brick-reload traffic")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from raytracinggrff_tpu.grids import UniformGrid
    from raytracinggrff_tpu.ops.pallas_trace import (grid_param_vec,
                                                     pack_cube_zc,
                                                     run_trace_segment)

    n = args.grid_n
    grid = UniformGrid.cube(3.0, n)
    rng = np.random.default_rng(0)
    wpe = rng.uniform(1e6, 2e6, (n, n, n)).astype(np.float32)
    zeros = np.zeros((n, n, n), np.float32)
    tcube = pack_cube_zc(wpe, zeros, zeros, zeros)
    scube = pack_cube_zc(wpe, wpe, wpe)

    def steps_of(rps):
        return 1 + (rps - 1) * args.stride + (args.stride - 1)

    results = []
    for spec in args.configs.split():
        rpt_s, brick_s = spec.split(":")
        rpt = int(rpt_s)
        brick = tuple(int(v) for v in brick_s.split(","))
        centers = rng.uniform(-2.0, 2.0, (args.n_tiles, 3)).astype(np.float32)
        state = np.zeros((args.n_tiles, 8, rpt), np.float32)
        for i in range(3):
            state[:, i, :] = centers[:, i:i + 1] + rng.uniform(
                -0.01, 0.01, (args.n_tiles, rpt)).astype(np.float32)
        if not args.stationary:
            kdir = rng.normal(size=(args.n_tiles, 3)).astype(np.float32)
            kdir /= np.linalg.norm(kdir, axis=1, keepdims=True)
            omega = np.float32(2 * np.pi * 75e6)   # |k| ~ omega: vacuum speed
            for i in range(3):
                state[:, 3 + i, :] = kdir[:, i:i + 1] * omega
        state[:, 6, :] = 1.0
        state_j = jnp.asarray(state)

        def run(rps):
            out = run_trace_segment(
                tcube, scube, state_j, grid_param_vec(grid),
                grid.shape, rpt, rps, args.stride,
                args.stride, 6e-3, 2.0, True, False,
                bx=brick[0], by=brick[1], bz=brick[2])
            float(np.asarray(out.state[0, 0, 0]))

        t0 = time.perf_counter()
        run(args.rps)
        run(2 * args.rps)
        compile_s = time.perf_counter() - t0
        d = []
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            run(args.rps)
            t1 = time.perf_counter()
            run(2 * args.rps)
            t2 = time.perf_counter()
            d.append((t2 - t1) - (t1 - t0))
        dmed = float(np.median(d))
        dsteps = steps_of(2 * args.rps) - steps_of(args.rps)
        tile_steps = args.n_tiles * dsteps
        us_per_tile_step = dmed / tile_steps * 1e6
        ns_per_lane_step = us_per_tile_step * 1e3 / rpt
        lane_rate = rpt / us_per_tile_step
        results.append((spec, ns_per_lane_step, lane_rate))
        print(f"{spec:16s} {us_per_tile_step:7.2f} us/tile-step  "
              f"{ns_per_lane_step:6.2f} ns/lane-step  "
              f"{lane_rate:6.1f}M lane-steps/s  compile {compile_s:.0f}s",
              flush=True)

    print("\nbest per-lane:", max(results, key=lambda r: r[2])[0],
          file=sys.stderr)


if __name__ == "__main__":
    main()
