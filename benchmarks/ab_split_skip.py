#!/usr/bin/env python
"""A/B: MNet ``split_skip`` (decoder skip concat elimination).

Measures stacked G1+G2 inference throughput with the decoder skip
concats materialized (baseline, the shipping default) vs carried as
(y, link) tuples whose consumer convs read the parts directly
(``MNet(split_skip=True)``, models/mnet.py). The flagship profile
attributes ~16% of device time to skip-concat + depth-to-space copies,
so the split form targets that bucket; it is exact (conv is linear in
input channels) and eval-only.

Mirrors bench.py's measurement discipline: lax.scan micro-batches per
dispatch, scalar readback per timed iteration (block_until_ready does
not sync through the axon tunnel).

Usage: python benchmarks/ab_split_skip.py [--size 256] [--width W]
           [--batch 128] [--steps 16]
Prints one JSON line per arm plus the delta.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.common import build_stacked, enable_cache

enable_cache()


def _maybe_force_platform(argv_platform: str | None):
    if argv_platform:
        import jax
        jax.config.update("jax_platforms", argv_platform)


def measure(split: bool, size: int, width: int, batch: int,
            steps: int, iters: int = 5) -> float:
    scanned, v1, v2, xs = build_stacked(size, width, batch=batch,
                                        steps=steps, split_skip=split)
    for _ in range(2):
        float(scanned(v1, v2, xs))  # warmup; host readback = hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        float(scanned(v1, v2, xs))
    dt = time.perf_counter() - t0
    return iters * steps * batch / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--width", type=int, default=0,
                    help="defaults to --size")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu for smoke "
                         "runs; env vars are too late — jax is "
                         "pre-imported in this environment)")
    args = ap.parse_args()
    _maybe_force_platform(args.platform)
    w = args.width or args.size

    base = measure(False, args.size, w, args.batch, args.steps,
                   iters=args.iters)
    split = measure(True, args.size, w, args.batch, args.steps,
                    iters=args.iters)
    print(json.dumps({
        "metric": f"stacked G1+G2 img/s @{args.size}x{w} "
                  f"batch{args.batch}",
        "baseline_concat": round(base, 1),
        "split_skip": round(split, 1),
        "delta_pct": round(100 * (split - base) / base, 2),
    }))


if __name__ == "__main__":
    main()
