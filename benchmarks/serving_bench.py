#!/usr/bin/env python
"""End-to-end serving benchmark: HTTP clients vs the micro-batcher.

Complements benchmarks/latency.py (bare per-dispatch device latency):
this drives the FULL serving stack — PNG decode, shape bucketing,
micro-batching window, one jitted dispatch per batch, PNG encode —
over a real loopback socket with concurrent clients, and reports
requests/sec plus client-observed latency percentiles and the mean
realized batch size (how well the window coalesces under load).

In this development environment the TPU sits behind a network tunnel
(~25 ms/dispatch, ~26 MB/s transfers), so absolute numbers here are
tunnel-bound; the relative effect of batching window / concurrency and
the CPU numbers are the portable part.

Usage: python benchmarks/serving_bench.py [--size 256x256]
         [--concurrency 8] [--requests 64] [--window-ms 5]
         [--dtype bfloat16] [--platform cpu] [--ngf 64]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import http.client
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.common import enable_cache

enable_cache()


def _percentiles(samples_ms):
    a = np.asarray(samples_ms, np.float64)
    return {p: round(float(np.percentile(a, p)), 1) for p in (50, 90, 99)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="256x256")
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--ngf", type=int, default=64)
    ap.add_argument("--devices", type=int, default=None,
                    help="data-parallel serving over the first N devices")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu for smoke runs)")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from shadow_removal_istd_tpu.serving import (
        InferenceEngine,
        ShadowRemovalServer,
    )
    from shadow_removal_istd_tpu.utils.image_io import imencode_png

    h, w = (int(v) for v in args.size.lower().split("x"))
    engine = InferenceEngine("mnet", ngf=args.ngf, dtype=args.dtype,
                             max_batch=args.max_batch,
                             devices=args.devices)
    ladder = [1 << i for i in range((args.max_batch).bit_length())
              if 1 << i <= args.max_batch]
    if ladder[-1] != args.max_batch:
        ladder.append(args.max_batch)
    engine.warmup([(h, w)], batch_sizes=ladder)
    server = ShadowRemovalServer(engine, port=0,
                                 window_ms=args.window_ms)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    host, port = server.address

    rng = np.random.default_rng(0)
    bodies = [imencode_png(rng.integers(0, 256, (h, w, 3),
                                        dtype=np.uint8))
              for _ in range(min(8, args.requests))]
    lat_ms, lock = [], threading.Lock()
    per_client = args.requests // args.concurrency
    barrier = threading.Barrier(args.concurrency + 1)

    def client(idx: int):
        conn = http.client.HTTPConnection(host, port, timeout=600)
        barrier.wait()
        for i in range(per_client):
            body = bodies[(idx + i) % len(bodies)]
            t0 = time.perf_counter()
            conn.request("POST", "/v1/unshadow", body=body)
            resp = conn.getresponse()
            resp.read()
            assert resp.status == 200, resp.status
            with lock:
                lat_ms.append((time.perf_counter() - t0) * 1e3)
        conn.close()

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.concurrency)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    snap = server.stats.snapshot()
    server.shutdown()
    n = len(lat_ms)
    print(json.dumps({
        "metric": f"serving e2e {h}x{w} ngf{args.ngf} {args.dtype} "
                  f"c{args.concurrency} w{args.window_ms}ms",
        "requests_per_s": round(n / dt, 1),
        "latency_ms": _percentiles(lat_ms),
        "mean_batch": round(snap["images"] / max(snap["batches"], 1), 2),
        "batches": snap["batches"],
    }))


if __name__ == "__main__":
    main()
