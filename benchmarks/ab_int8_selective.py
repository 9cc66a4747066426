#!/usr/bin/env python
"""A/B: SELECTIVE int8 — encoder convs s8, decoder bf16 (VERDICT r4 #7).

The whole-net int8 A/B lost to bf16 (2137 vs 2550 flagship img/s): the
quantize/dequantize passes and s32 accumulator traffic cost more than
the s8 MXU rate returns at these widths, and the folded graph itself
starts ~6% behind flax bf16 (pre-folding defeats XLA's conv-epilogue
fusion). This measures the middle ground: quantize ONLY the wide
stride-2 encoder convs (stem + down0..3 — where the MXU win lives) and
keep the bandwidth-bound subpixel decoder in bf16
(models/quant.py::mnet_apply_folded quant_sites=ENCODER_SITES).

Arms, all stacked G1+G2 @256^2 batch 128 (the flagship config):
  flax-bf16      — the shipping default (baseline)
  folded-bf16    — folded graph, no quantization (isolates fold cost)
  int8-full      — the measured r3 rejection, re-run for this column
  int8-encoder   — the new selective arm

Usage: python benchmarks/ab_int8_selective.py [--batch 128] [--steps 4]
Prints one JSON line per arm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.common import build_stacked, enable_cache  # noqa: E402

enable_cache()


def _time(scanned, args_, iters=4):
    for _ in range(2):
        float(scanned(*args_))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(scanned(*args_))
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args(argv)
    B, S, H = args.batch, args.steps, args.size

    from shadow_removal_istd_tpu.engine import (
        TrainConfig,
        build_models,
        init_state,
    )
    from shadow_removal_istd_tpu.models.quant import (
        ENCODER_SITES,
        fold_stacked,
        mnet_apply_folded,
        quantize_stacked,
    )

    n_img = S * B

    def report(arm, dt, base=None):
        rate = n_img / dt
        print(json.dumps({
            "metric": "stacked inference int8-selective A/B",
            "arm": arm, "images_per_sec": round(rate, 1),
            "vs_flax_bf16": (round(rate / base - 1.0, 4)
                             if base else 0.0),
            "batch": B, "size": H}), flush=True)
        return rate

    # --- arm 1: flax bf16 (shipping default) -------------------------
    scanned, v1, v2, xs = build_stacked(H, H, batch=B, steps=S)
    base = report("flax-bf16", _time(scanned, (v1, v2, xs)))

    # shared state for the folded/quantized arms: a real TrainState so
    # BN stats/params have the production tree layout
    # nn_upconv=True: the PTQ fold supports the nearest-upsample
    # decoder (the flagship bench's default construction too)
    cfg = TrainConfig(ngf=64, ndf=64, image_size=H, batch_size=B,
                      use_visual_loss=False, droprate=0.0,
                      steps_per_epoch=1, nn_upconv=True)
    state = init_state(jax.random.key(0), cfg, build_models(cfg))
    calib = [jax.random.uniform(jax.random.key(7), (8, H, H, 3),
                                jnp.float32) * 2 - 1]
    f1, f2 = fold_stacked(state)
    q1, q2 = quantize_stacked(state, calib)

    def stacked_fn(fold1, fold2, qp1, qp2, sites):
        ap1 = partial(mnet_apply_folded, activation="tanh",
                      qparams=qp1, quant_sites=sites,
                      compute_dtype=jnp.bfloat16)
        ap2 = partial(mnet_apply_folded, activation="tanh",
                      qparams=qp2, quant_sites=sites,
                      compute_dtype=jnp.bfloat16)

        @jax.jit
        def scanned(xs):
            def body(acc, x):
                m = ap1(fold1, x)
                y = ap2(fold2, jnp.concatenate(
                    [x.astype(jnp.float32), m], axis=-1))
                return acc + jnp.sum(y.astype(jnp.float32)), None
            total, _ = jax.lax.scan(body, jnp.zeros(()), xs)
            return total
        return scanned

    xs_f = xs.astype(jnp.bfloat16)
    report("folded-bf16", _time(stacked_fn(f1, f2, None, None, None),
                                (xs_f,)), base)
    report("int8-full", _time(stacked_fn(f1, f2, q1, q2, None),
                              (xs_f,)), base)
    report("int8-encoder", _time(
        stacked_fn(f1, f2, q1, q2, ENCODER_SITES), (xs_f,)), base)


if __name__ == "__main__":
    main()
