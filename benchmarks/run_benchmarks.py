#!/usr/bin/env python
"""Benchmark suite — the five BASELINE.json configurations.

1. G1 U-Net forward, single 256x256 triplet, CPU
2. Stacked G1->G2 inference over an ISTD-test-sized split at 480x640
3. Jitted adversarial train step (G1/G2 + PatchGAN D1/D2), batch 8
4. Full training epoch: device-cached data + fused augmentation,
   data-parallel when >1 device
5. End-to-end eval: LAB RMSE protocol over rendered images

Each prints one JSON line; ``--suite`` runs all. All timings hard-sync
via scalar readbacks (block_until_ready is unreliable through the TPU
tunnel) and amortize dispatch overhead with lax.scan where meaningful.

Usage: python benchmarks/run_benchmarks.py [--suite | --only N]
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

from benchmarks.common import build_stacked, enable_cache  # noqa: E402

enable_cache()


def _result(name, value, unit, **extra):
    print(json.dumps({"metric": name, "value": round(value, 3),
                      "unit": unit, **extra}))


def _fill_params(model, x_shape):
    shapes = jax.eval_shape(model.init, {"params": jax.random.key(0)},
                            jnp.zeros(x_shape, jnp.float32))
    return jax.tree.map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype)
        if s.dtype == jnp.float32 else jnp.zeros(s.shape, s.dtype), shapes)


def bench_g1_forward_cpu():
    """Config 1: single-sample G1 U-Net forward on the host CPU."""
    from shadow_removal_istd_tpu.models import get_generator

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        g1 = get_generator("unet", in_channels=3, out_channels=1)
        v = _fill_params(g1, (1, 256, 256, 3))
        x = jnp.zeros((1, 256, 256, 3), jnp.float32)
        fwd = jax.jit(lambda v, x: jnp.sum(g1.apply(v, x)))
        float(fwd(v, x))
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            float(fwd(v, x))
        dt = (time.perf_counter() - t0) / n
    _result("G1 UNet fwd 256x256 single, CPU", 1.0 / dt, "images/sec")


def bench_stacked_fullres():
    """Config 2: stacked G1->G2 at native 480x640 (ISTD test res)."""
    # measured on v5e (after the phase-affine bf16-d2s fix, r3): B=64 ->
    # 427 img/s, 96 -> 477, 128 -> 500, 160 -> 444; before the fix the
    # sweep was flat at ~383 from B=48 up — halving the d2s copy bytes
    # is what let larger batches scale again
    B, STEPS = 128, 4
    scanned, v1, v2, xs = build_stacked(480, 640, batch=B, steps=STEPS)
    float(scanned(v1, v2, xs))
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        float(scanned(v1, v2, xs))
    dt = (time.perf_counter() - t0) / n
    _result("stacked G1+G2 inference 480x640 (bf16)",
            STEPS * B / dt, "images/sec")


def bench_train_step():
    """Config 3: jitted adversarial train step, batch 8, 256x256."""
    from shadow_removal_istd_tpu.engine import (
        TrainConfig,
        build_models,
        init_state,
    )
    from shadow_removal_istd_tpu.engine.steps import _unjitted_train_step

    cfg = TrainConfig(ngf=64, ndf=64, image_size=256, batch_size=8,
                      use_visual_loss=False, droprate=0.05,
                      steps_per_epoch=8)
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models)
    step = _unjitted_train_step(models, cfg)
    ks = jax.random.split(jax.random.key(1), 3)
    batch = (jax.random.uniform(ks[0], (8, 256, 256, 3)) * 2 - 1,
             jax.random.uniform(ks[1], (8, 256, 256, 1)) * 2 - 1,
             jax.random.uniform(ks[2], (8, 256, 256, 3)) * 2 - 1)
    N = 8

    @jax.jit
    def scanned(state, rng):
        def body(st, i):
            st, metrics = step(st, batch, jax.random.fold_in(rng, i),
                               1.0, 1.0)
            return st, metrics["G"]
        st, gs = jax.lax.scan(body, state, jnp.arange(N))
        return st, jnp.sum(gs)

    state, s = scanned(state, jax.random.key(2))
    float(s)
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        state, s = scanned(state, jax.random.key(3 + i))
        float(s)
    dt = (time.perf_counter() - t0) / n
    _result("adversarial train step G1/G2+PatchGAN D1/D2 batch 8",
            N * 8 / dt, "images/sec")


def bench_full_training():
    """Config 4: full epoch with fused on-device augmentation from
    480x640 sources loaded through the HDF5 dataset (data-parallel over
    all devices). Matches BASELINE config 4: dataset_h5 loader + fused
    augmentations (reference STCGAN/dataset_h5.py:34-65)."""
    import tempfile

    from shadow_removal_istd_tpu.data.device_cache import (
        DeviceDatasetCache,
    )
    from shadow_removal_istd_tpu.data.h5 import ISTDH5Dataset, build_h5
    from shadow_removal_istd_tpu.data.synthetic import write_istd_layout
    from shadow_removal_istd_tpu.engine import (
        TrainConfig,
        build_models,
        init_state,
    )
    from shadow_removal_istd_tpu.engine.epoch import make_scanned_epoch
    from shadow_removal_istd_tpu.parallel import make_mesh, shard_state

    n_dev = len(jax.devices())
    batch = 16 * max(n_dev, 1)
    # the synthetic dataset must hold >= 1 full batch or the drop_last
    # epoch has zero steps and the bench reports a meaningless 0 img/s
    n_train = max(128, batch)
    cfg = TrainConfig(ngf=64, ndf=64, image_size=256, batch_size=batch,
                      use_visual_loss=False, droprate=0.05,
                      steps_per_epoch=8, compute_dtype="bfloat16",
                      aug_method="shear")
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models)
    mesh = make_mesh() if n_dev > 1 else None
    if mesh is not None:
        state = shard_state(mesh, state)
    with tempfile.TemporaryDirectory() as tmp:
        root = os.path.join(tmp, "istd")
        write_istd_layout(root, n_train=n_train, n_test=2, h=480, w=640)
        h5_path = os.path.join(tmp, "istd.h5")
        build_h5(h5_path, root)
        t0 = time.perf_counter()
        streams = ISTDH5Dataset(h5_path, "train").load_streams(
            ("img", "matte", "target"))
        h5_dt = time.perf_counter() - t0
    _result(f"HDF5 bulk load ({n_train} x 480x640 triplets)",
            n_train / h5_dt, "images/sec")
    if mesh is not None:
        from shadow_removal_istd_tpu.parallel import replicated_sharding
        cache = DeviceDatasetCache(streams, replicated_sharding(mesh))
    else:
        cache = DeviceDatasetCache(streams)
    epoch_fn = make_scanned_epoch(models, cfg, mesh=mesh)
    idx = cache.epoch_indices(jax.random.key(1), cfg.batch_size)
    state, sums = epoch_fn(state, cache._arrays, idx, jax.random.key(2),
                           1.0, 1.0)
    float(sums["G"])
    t0 = time.perf_counter()
    n = 2
    for i in range(n):
        state, sums = epoch_fn(state, cache._arrays, idx,
                               jax.random.key(3 + i), 1.0, 1.0)
        float(sums["G"])
    dt = (time.perf_counter() - t0) / n
    n_img = idx.shape[0] * cfg.batch_size
    _result("full training epoch (device cache + fused augmentation)",
            n_img / dt, "images/sec", devices=n_dev)


def bench_eval_parity():
    """Config 5: LAB RMSE protocol throughput + self-consistency."""
    from shadow_removal_istd_tpu.metrics.metrics import (
        aggregate_regions,
        region_metrics,
    )
    from shadow_removal_istd_tpu.ops.color import rgb_to_lab

    rng = np.random.default_rng(0)
    imgs1 = jnp.asarray(rng.uniform(0, 1, (16, 480, 640, 3)),
                        jnp.float32)
    imgs2 = jnp.asarray(rng.uniform(0, 1, (16, 480, 640, 3)),
                        jnp.float32)
    masks = jnp.asarray(rng.uniform(size=(16, 480, 640)) > 0.5)

    @jax.jit
    def run(a, b, m):
        parts = region_metrics(rgb_to_lab(a), rgb_to_lab(b), m)
        return parts["rmse_sum"], parts["pixels"]

    r, p = run(imgs1, imgs2, masks)
    float(r)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        r, p = run(imgs1, imgs2, masks)
        float(r)
    dt = (time.perf_counter() - t0) / n
    agg = aggregate_regions([{k: float(v) for k, v in
                              zip(("rmse_sum", "pixels"), (r, p))}
                             | {"mae_sum": 0.0, "rmse_non_sum": 0.0,
                                "mae_non_sum": 0.0, "pixels_non": 1.0}])
    _result("LAB RMSE eval protocol 480x640", 16 / dt, "images/sec",
            sample_rmse=round(agg["rmse"], 4))


BENCHES = [bench_g1_forward_cpu, bench_stacked_fullres, bench_train_step,
           bench_full_training, bench_eval_parity]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--suite", action="store_true",
                        help="run all five BASELINE configs (default "
                             "when --only is not given)")
    parser.add_argument("--only", type=int, default=None,
                        choices=range(1, len(BENCHES) + 1),
                        help="run one benchmark (1-5)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu to run "
                             "config 1 — itself a CPU measurement — "
                             "while the TPU tunnel is down; env vars "
                             "are too late, jax is pre-imported here)")
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.only is not None:
        BENCHES[args.only - 1]()
        return
    for b in BENCHES:
        b()


if __name__ == "__main__":
    main()
