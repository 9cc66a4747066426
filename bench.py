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
import os
import subprocess
import sys
import time

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
    from benchmarks.common import build_stacked

    return build_stacked(SIZE, SIZE, batch=BATCH, steps=STEPS)


# v5e (TPU v5 lite) single-chip bf16 peak, for the MFU report.
V5E_BF16_PEAK_TFLOPS = 197.0

# Bounded retry against TPU-tunnel blips (round 3 lost its benchmark
# artifact to a transient "Unable to initialize backend 'axon':
# UNAVAILABLE"). Each attempt runs in a fresh interpreter because a
# failed backend init poisons the process: jax caches the dead backend
# for the lifetime of the interpreter, so an in-process retry can never
# succeed.
ATTEMPTS = 3
BACKOFF_SECS = (60, 120)


def measure():
    from benchmarks.common import enable_cache

    enable_cache()
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


def _probe_backend(timeout_s: int = 240):
    """Cheap backend-liveness check in a throwaway interpreter.

    A down tunnel can HANG ``jax.devices()`` indefinitely rather than
    fail fast (observed: >9.5 min with no error), so each retry
    attempt first pays at most ``timeout_s`` on this probe instead of
    the full measurement timeout.  Returns (ok, detail).
    """
    code = ("import jax; d = jax.devices(); import jax.numpy as jnp; "
            "print('probe-ok', d[0].platform, "
            "float(jnp.sum(jnp.ones((8, 8)))))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe hung >{timeout_s}s (tunnel down?)"
    if proc.returncode != 0 or "probe-ok" not in proc.stdout:
        tail = [ln for ln in (proc.stderr or "").strip().splitlines()
                if ln]
        return False, "; ".join(tail[-2:]) or f"rc={proc.returncode}"
    return True, proc.stdout.strip()


def main():
    """Run the measurement in a child interpreter with bounded retry."""
    errors = []
    for attempt in range(ATTEMPTS):
        if attempt:
            delay = BACKOFF_SECS[min(attempt - 1, len(BACKOFF_SECS) - 1)]
            print(f"bench: attempt {attempt} failed; retrying in "
                  f"{delay}s", file=sys.stderr)
            time.sleep(delay)
        ok, detail = _probe_backend()
        if not ok:
            print(f"bench: backend probe failed: {detail}",
                  file=sys.stderr)
            errors.append({"attempt": attempt + 1, "rc": "probe-failed",
                           "stderr_tail": [detail[:300]]})
            continue
        try:
            # 40 min cap per attempt: a cold-cache compile through the
            # tunnel can run 5-12 min; a hang should not eat the round.
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--once"],
                stderr=subprocess.PIPE, text=True, timeout=2400,
                cwd=os.path.dirname(os.path.abspath(__file__)))
        except subprocess.TimeoutExpired as e:
            errors.append({"attempt": attempt + 1, "rc": "timeout",
                           "stderr_tail": [repr(e)[:200]]})
            continue
        sys.stderr.write(proc.stderr)
        if proc.returncode == 0:
            return 0
        tail = [ln for ln in proc.stderr.strip().splitlines() if ln]
        errors.append({"attempt": attempt + 1, "rc": proc.returncode,
                       "stderr_tail": tail[-3:]})
    # Persistent failure: one machine-readable diagnostic line instead
    # of a bare traceback, so the driver artifact records what happened.
    print(json.dumps({
        "metric": "stacked G1+G2 inference images/sec @256x256 (bf16)",
        "value": None,
        "unit": "images/sec",
        "vs_baseline": None,
        "error": "all attempts failed (TPU backend unavailable?)",
        "attempts": errors,
    }))
    return 1


if __name__ == "__main__":
    if "--once" in sys.argv[1:]:
        measure()
    else:
        sys.exit(main())
