#!/usr/bin/env python
"""Serving latency: stacked G1+G2 inference, one dispatch per request.

Throughput benches (bench.py, run_benchmarks.py) amortize dispatch cost
with lax.scan micro-batches; a serving deployment cannot — each request
is one jit call. This measures per-call wall latency (p50/p90/p99) for
small batches at 256x256 and native 480x640, the two shapes the
reference serves (src/cgan.py:420-464 infers at full resolution;
training/validation run 256 crops).

The per-call floor includes the host->device dispatch path. In this
development environment that path is an axon network tunnel with ~25 ms
round-trip — orders of magnitude above a real TPU host's PCIe/gRPC
dispatch — so the report also measures a trivial jitted readback
(`overhead_ms`) and reports `net_ms` = p50 - overhead as the
environment-independent estimate. On a real host, read p50 directly.

Usage: python benchmarks/latency.py [--batches 1 4 8] [--iters 50]
Prints one JSON line per (shape, batch).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import enable_cache, fill_params_bf16

enable_cache()


def _percentiles(samples_ms):
    a = np.sort(np.asarray(samples_ms))
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 3),
        "p90_ms": round(float(np.percentile(a, 90)), 3),
        "p99_ms": round(float(np.percentile(a, 99)), 3),
    }


def measure_overhead(iters: int) -> float:
    """Median wall time of a trivial jitted scalar readback: the
    fixed per-dispatch cost of this host<->device path."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros(())
    for _ in range(3):
        float(f(x))
    t = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(f(x))
        t.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(t))


def measure(h: int, w: int, batch: int, iters: int,
            overhead_ms: float) -> dict:
    from shadow_removal_istd_tpu.models import get_generator

    g1 = get_generator("mnet", in_channels=3, out_channels=1)
    g2 = get_generator("mnet", in_channels=4, out_channels=3)
    v1 = fill_params_bf16(g1, (1, h, w, 3))
    v2 = fill_params_bf16(g2, (1, h, w, 4))

    @jax.jit
    def step(v1, v2, x):
        m = g1.apply(v1, x)
        y = g2.apply(v2, jnp.concatenate([x, m], axis=-1))
        # scalar readback per request = the hard sync this tunnel needs
        # (block_until_ready does not sync through it); on a real host
        # a served request would device_get the full image instead.
        return jnp.sum(y.astype(jnp.float32))

    x = jax.random.uniform(jax.random.key(1), (batch, h, w, 3),
                           jnp.bfloat16) * 2 - 1
    for _ in range(3):
        float(step(v1, v2, x))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(step(v1, v2, x))
        samples.append((time.perf_counter() - t0) * 1e3)
    out = {"metric": f"stacked G1+G2 serving latency @{h}x{w}",
           "batch": batch, **_percentiles(samples),
           "overhead_ms": round(overhead_ms, 3)}
    out["net_ms"] = round(max(out["p50_ms"] - overhead_ms, 0.0), 3)
    out["net_img_per_s"] = (round(batch / out["net_ms"] * 1e3, 1)
                            if out["net_ms"] > 0 else None)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--shapes", type=str, nargs="+",
                    default=["256x256", "480x640"])
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu for smoke "
                         "runs; env vars are too late here — this "
                         "environment pre-imports jax at startup)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    overhead = measure_overhead(args.iters)
    for shape in args.shapes:
        h, w = (int(s) for s in shape.split("x"))
        for b in args.batches:
            print(json.dumps(measure(h, w, b, args.iters, overhead)),
                  flush=True)


if __name__ == "__main__":
    main()
