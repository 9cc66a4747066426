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

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/srit_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(split: bool, size: int, width: int, batch: int,
            steps: int, iters: int = 5) -> float:
    from shadow_removal_istd_tpu.models import get_generator

    g1 = get_generator("mnet", in_channels=3, out_channels=1,
                       split_skip=split)
    g2 = get_generator("mnet", in_channels=4, out_channels=3,
                       split_skip=split)
    k = jax.random.key(0)
    s1 = jax.eval_shape(g1.init, {"params": k},
                        jnp.zeros((1, size, width, 3)))
    s2 = jax.eval_shape(g2.init, {"params": k},
                        jnp.zeros((1, size, width, 4)))
    fill = lambda tree: jax.tree.map(  # noqa: E731
        lambda s: (jnp.full(s.shape, 0.01, jnp.bfloat16)
                   if s.dtype == jnp.float32
                   else jnp.zeros(s.shape, s.dtype)), tree)
    v1, v2 = fill(s1), fill(s2)

    @jax.jit
    def scanned(v1, v2, xs):
        def body(acc, x):
            m = g1.apply(v1, x)
            y = g2.apply(v2, jnp.concatenate([x, m], axis=-1))
            return acc + jnp.sum(y.astype(jnp.float32)), None
        total, _ = jax.lax.scan(body, jnp.zeros(()), xs)
        return total

    xs = jax.random.uniform(
        jax.random.key(1), (steps, batch, size, width, 3),
        jnp.bfloat16) * 2 - 1
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
    args = ap.parse_args()
    w = args.width or args.size

    base = measure(False, args.size, w, args.batch, args.steps)
    split = measure(True, args.size, w, args.batch, args.steps)
    print(json.dumps({
        "metric": f"stacked G1+G2 img/s @{args.size}x{w} "
                  f"batch{args.batch}",
        "baseline_concat": round(base, 1),
        "split_skip": round(split, 1),
        "delta_pct": round(100 * (split - base) / base, 2),
    }))


if __name__ == "__main__":
    main()
