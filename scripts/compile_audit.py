#!/usr/bin/env python
"""Per-variant compile-cost audit for the canonical trace workload.

Measures where cold-start wall time goes before the first pixel: every
XLA/Mosaic compilation triggered by the canonical bench trace
(256^2 rays x 5000 steps, seg_records segments) is captured from JAX's
compile logs with its duration, and the persistent-compilation-cache hit
state is reported per entry.

Usage:
    python scripts/compile_audit.py --cache fresh   # cold: empty cache dir
    python scripts/compile_audit.py --cache warm    # reuse default cache
    python scripts/compile_audit.py --seg-records 64 ...

Prints one JSON line: {"mode", "warmup_s", "compiles": [{name, s}...],
"total_compile_s", "n_compiles"} and a human table on stderr.
"""

import argparse
import json
import logging
import re
import sys
import tempfile
import time


class CompileLogCapture(logging.Handler):
    """Collect 'Finished XLA compilation of <name> in <t> sec' records."""

    PAT = re.compile(r"Finished (?:XLA compilation|jaxpr to MLIR module "
                     r"conversion|tracing) of ([^ ]+).* in ([0-9.e+-]+) sec")

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.entries = []

    def emit(self, record):
        m = self.PAT.search(record.getMessage())
        if m:
            kind = ("xla" if "XLA compilation" in record.getMessage()
                    else "mlir" if "MLIR" in record.getMessage()
                    else "trace")
            self.entries.append((kind, m.group(1), float(m.group(2))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cache", choices=["fresh", "warm"], default="fresh")
    p.add_argument("--n-pix", type=int, default=256)
    p.add_argument("--n-steps", type=int, default=5000)
    p.add_argument("--grid-n", type=int, default=128)
    p.add_argument("--seg-records", type=int, default=16)
    p.add_argument("--rpt", type=int, default=128)
    args = p.parse_args()

    import jax
    if args.cache == "fresh":
        cache_dir = tempfile.mkdtemp(prefix="jax_cc_cold_")
    else:
        cache_dir = "/root/.cache/jax_comp_cache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_explain_cache_misses", True)

    cap = CompileLogCapture()
    # handler on the "jax" parent ONLY: attaching to child loggers too
    # double-counts every record (children propagate to the parent),
    # which doubled total_compile_s in the first audit artifacts
    for name in ("jax._src.interpreters.pxla", "jax._src.compiler",
                 "jax._src.dispatch"):
        logging.getLogger(name).setLevel(logging.DEBUG)
    root = logging.getLogger("jax")
    root.setLevel(logging.DEBUG)
    root.addHandler(cap)

    sys.path.insert(0, ".")
    from bench import make_cube, make_rays
    import numpy as np
    from raytracinggrff_tpu.tracer_pallas import (iter_tail_traces,
                                                  iter_trace_segments)

    grid, omega_pe, ne = make_cube(args.grid_n, 75e6)
    te = np.full_like(ne, 1.4e6)
    b = np.ones_like(ne)
    start, kdir = make_rays(args.n_pix)

    import jax.numpy as jnp

    @jax.jit
    def accum(a, recs):        # one chained dispatch per segment (as bench.py)
        return a + recs[-1, 0, 0]

    t0 = time.perf_counter()
    stats = {}
    acc = jnp.zeros((), jnp.float32)
    for recs in iter_trace_segments(
            omega_pe, ne, te, b, grid, 75e6, start, kdir, 6e-3,
            args.n_steps, 10, trace_crosssections=True, perturb_ratio=2.0,
            rpt=args.rpt, seg_records=args.seg_records, stats=stats):
        acc = accum(acc, recs)
    float(acc)
    for _, _, recs_t in iter_tail_traces(stats, omega_pe, ne, te, b, grid,
                                         6e-3, 10, True, 2.0):
        float(recs_t[-1, 0, 0])
    warmup_s = time.perf_counter() - t0

    xla = [(n, s) for k, n, s in cap.entries if k == "xla"]
    xla.sort(key=lambda e: -e[1])
    total = sum(s for _, s in xla)
    print(f"-- {args.cache} cache, warmup {warmup_s:.1f}s, "
          f"{len(xla)} XLA compiles totalling {total:.1f}s --",
          file=sys.stderr)
    for n, s in xla:
        print(f"  {s:8.2f}s  {n}", file=sys.stderr)
    print(json.dumps({
        "mode": args.cache,
        "seg_records": args.seg_records,
        "warmup_s": round(warmup_s, 1),
        "n_compiles": len(xla),
        "total_compile_s": round(total, 1),
        "compiles": [{"name": n, "s": round(s, 2)} for n, s in xla],
    }))


if __name__ == "__main__":
    main()
