#!/usr/bin/env python
"""Benchmark: stacked G1+G2 inference throughput at 256x256.

The project's north-star metric (BASELINE.json): images/sec for the
stacked shadow-detection + shadow-removal generators at 256x256 on TPU,
vs the PyTorch reference on GPU. The reference repo publishes no
benchmark numbers (README.md has none; BASELINE.json "published" is
empty), so ``vs_baseline`` is computed against a documented estimate of
the reference's GPU throughput.

Measurement notes:
- a lax.scan over micro-batches inside one jit call amortizes the
  per-call host round-trip (the TPU tunnel adds ~25ms per dispatch);
- each timed iteration ends in a scalar host readback —
  ``block_until_ready`` is not a reliable sync point through the
  experimental axon platform.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

import json
import time

from benchmarks.common import build_stacked, enable_cache

enable_cache()

# Estimated reference throughput: PyTorch MNet G1+G2 (12.4M params each,
# fp32, NCHW) at 256^2 on a single V100/2080Ti-class GPU is ~100-150
# img/s for batched inference. No published number exists in the
# reference repo; 120 img/s is the documented working estimate.
ESTIMATED_REFERENCE_GPU_IPS = 120.0

STEPS = 16      # micro-batches per jit call (scan); 16 amortizes the
                # ~25ms tunnel dispatch to <2% (8 -> 2550, 16 -> 2690)
BATCH = 128     # measured optimum on v5e: 64 -> 2050 img/s eqv,
                # 128 -> 2584, 256 -> 2270 (HBM pressure)
SIZE = 256
WARMUP = 2
ITERS = 5


def build():
    # shared with benchmarks/ (same scan/fill/readback discipline)
    return build_stacked(SIZE, SIZE, batch=BATCH, steps=STEPS)


# v5e (TPU v5 lite) single-chip bf16 peak, for the MFU report.
V5E_BF16_PEAK_TFLOPS = 197.0


def main():
    scanned, v1, v2, xs = build()
    # Analytic MXU FLOPs from the jaxpr — XLA's compiled cost_analysis
    # under-reports conv FLOPs on the TPU backend (fused custom calls).
    flops_per_call = None
    try:
        from shadow_removal_istd_tpu.utils.flops import count_flops

        flops_per_call = count_flops(scanned, v1, v2, xs)
    except Exception:
        pass
    for _ in range(WARMUP):
        float(scanned(v1, v2, xs))  # host readback = hard sync

    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(scanned(v1, v2, xs))
    dt = time.perf_counter() - t0

    ips = ITERS * STEPS * BATCH / dt
    out = {
        "metric": "stacked G1+G2 inference images/sec @256x256 (bf16)",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / ESTIMATED_REFERENCE_GPU_IPS, 3),
    }
    if flops_per_call:
        tflops = flops_per_call * ITERS / dt / 1e12
        out["gflop_per_image"] = round(
            flops_per_call / (STEPS * BATCH) / 1e9, 2)
        out["achieved_tflops"] = round(tflops, 2)
        out["mfu_vs_v5e_bf16_peak"] = round(
            tflops / V5E_BF16_PEAK_TFLOPS, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
