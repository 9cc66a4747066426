#!/usr/bin/env python
"""A/B: attacking the train step's BatchNorm ~28% (VERDICT r4 item 3).

The r3 trace of the raw train step (README) splits BatchNorm's cost as
multiply-add 15.9% + f32 convert-reduce 11.9%. Structural analysis
first, measurement second:

- The stat reduce CANNOT fuse with the normalize (the normalize's
  scalars are the reduce's output — a hard data dependency), so BN
  train fwd is floored at 2 reads + 1 write of the activation. Whether
  XLA already achieves that floor (one fused convert+mean+mean2 pass)
  is checked here by counting reduce fusions in the optimized TPU HLO.
- The only lever that REMOVES bytes is reading less: stat subsampling
  (every k-th image row; models/layers.py BN_STAT_STRIDE, opt-in, an
  estimator change — documented, default off).
- ``unroll`` on the epoch scan is a free knob to A/B while we're here.

Variants timed on the fused-epoch path (the 326 img/s flagship train
config): baseline, stride 2, stride 4, unroll 2. One JSON line each.

Usage: python benchmarks/ab_bn_stats.py [--batch 16] [--epochs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.common import enable_cache  # noqa: E402

enable_cache()


def build(batch, size, n_train, stride=1, unroll=1):
    from shadow_removal_istd_tpu.data.device_cache import DeviceDatasetCache
    from shadow_removal_istd_tpu.data.synthetic import synthetic_triplets
    from shadow_removal_istd_tpu.engine import (
        TrainConfig,
        build_models,
        init_state,
    )
    from shadow_removal_istd_tpu.engine.epoch import make_scanned_epoch
    from shadow_removal_istd_tpu.models.layers import set_bn_stat_stride

    set_bn_stat_stride(stride)
    cfg = TrainConfig(ngf=64, ndf=64, image_size=size, batch_size=batch,
                      use_visual_loss=False, droprate=0.05,
                      steps_per_epoch=max(n_train // batch, 1),
                      compute_dtype="bfloat16", aug_method="shear")
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models)
    data = synthetic_triplets(n_train, 480, 640, seed=0)
    streams = {k: data[k] for k in ("img", "matte", "target")}
    cache = DeviceDatasetCache(streams)
    epoch_fn = make_scanned_epoch(models, cfg, unroll=unroll)
    idx = cache.epoch_indices(jax.random.key(1), batch)
    return state, cache, epoch_fn, idx, cfg


def time_epoch(state, cache, epoch_fn, idx, reps=3):
    state, sums = epoch_fn(state, cache._arrays, idx, jax.random.key(2),
                           1.0, 1.0)
    float(sums["G"])  # hard sync (block_until_ready lies on the tunnel)
    t0 = time.perf_counter()
    for i in range(reps):
        state, sums = epoch_fn(state, cache._arrays, idx,
                               jax.random.key(3 + i), 1.0, 1.0)
        g = float(sums["G"])
    dt = (time.perf_counter() - t0) / reps
    assert np.isfinite(g), g
    return dt


def hlo_reduce_report(state, cache, epoch_fn, idx):
    """Structural check on the optimized TPU HLO: are mean and mean2
    emitted as ONE fused convert-reduce pass per BN (the floor), or as
    separate passes (a fusable gap)? Reported, not asserted — the
    numbers inform the accept/reject call in RESULTS.md."""
    lowered = epoch_fn.lower(state, cache._arrays, idx,
                             jax.random.key(2), 1.0, 1.0)
    txt = lowered.compile().as_text()
    # computation bodies print as "%fused_computation.N (...) -> ... {"
    # (leading %, dotted suffix) — split on definitions, not lines
    fusions = re.split(r"\n(?=%?\w*fused_computation)", txt)
    n_with_reduce = 0
    n_with_two_reduces = 0
    for body in fusions[1:]:
        body = body.split("\n\n", 1)[0]
        k = len(re.findall(r"\breduce\(", body))
        if k >= 1:
            n_with_reduce += 1
        if k >= 2:
            n_with_two_reduces += 1
    print(json.dumps({
        "metric": "train-epoch HLO reduce-fusion structure",
        "fusions_with_reduce": n_with_reduce,
        "fusions_with_2plus_reduces": n_with_two_reduces,
    }), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="baseline,stride2,stride4,unroll2",
                    help="comma list: baseline | strideK | unrollK")
    ap.add_argument("--hlo-report", action="store_true",
                    help="also dump the reduce-fusion structure of the "
                         "baseline's optimized HLO")
    args = ap.parse_args(argv)

    results = {}
    if args.hlo_report:
        state, cache, epoch_fn, idx, _ = build(
            args.batch, args.size, args.n_train)
        hlo_reduce_report(state, cache, epoch_fn, idx)
    for variant in args.variants.split(","):
        stride, unroll = 1, 1
        if variant.startswith("stride"):
            stride = int(variant[len("stride"):])
        elif variant.startswith("unroll"):
            unroll = int(variant[len("unroll"):])
        elif variant != "baseline":
            raise SystemExit(f"unknown variant {variant}")
        state, cache, epoch_fn, idx, cfg = build(
            args.batch, args.size, args.n_train, stride, unroll)
        dt = time_epoch(state, cache, epoch_fn, idx, args.reps)
        n_img = idx.shape[0] * args.batch
        rate = n_img / dt
        results[variant] = rate
        base = results.get("baseline")
        print(json.dumps({
            "metric": "fused train epoch (BN A/B)",
            "variant": variant, "images_per_sec": round(rate, 1),
            "vs_baseline": (round(rate / base - 1.0, 4)
                            if base and variant != "baseline" else 0.0),
            "batch": args.batch, "size": args.size,
        }), flush=True)
    # reset the knob so nothing later in the process inherits it
    from shadow_removal_istd_tpu.models.layers import set_bn_stat_stride
    set_bn_stat_stride(1)


if __name__ == "__main__":
    main()
