#!/usr/bin/env python
"""Benchmark: stacked G1+G2 inference throughput at 256x256.

The project's north-star metric (BASELINE.json): images/sec for the
stacked shadow-detection + shadow-removal generators at 256x256 on TPU,
vs the PyTorch reference on GPU. The reference repo publishes no
benchmark numbers (README.md has none; BASELINE.json "published" is
empty), so ``vs_baseline`` is computed against a documented estimate of
the reference's GPU throughput.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp

# Estimated reference throughput: PyTorch MNet G1+G2 (12.4M params each,
# fp32, NCHW) at 256^2 on a single V100/2080Ti-class GPU is ~100-150
# img/s for batched inference. No published number exists in the
# reference repo; 120 img/s is the documented working estimate.
ESTIMATED_REFERENCE_GPU_IPS = 120.0

BATCH = 32
SIZE = 256
WARMUP = 3
ITERS = 15


def build():
    from shadow_removal_istd_tpu.models import get_generator

    g1 = get_generator("mnet", in_channels=3, out_channels=1)
    g2 = get_generator("mnet", in_channels=4, out_channels=3)
    k = jax.random.key(0)
    v1 = g1.init({"params": k}, jnp.zeros((1, SIZE, SIZE, 3)))
    v2 = g2.init({"params": k}, jnp.zeros((1, SIZE, SIZE, 4)))
    # bf16 weights + activations: the MXU-native inference configuration
    cast = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    v1, v2 = cast(v1), cast(v2)

    @jax.jit
    def stacked(v1, v2, x):
        m = g1.apply(v1, x)
        y = g2.apply(v2, jnp.concatenate([x, m], axis=-1))
        # scalar checksum: forces full execution; block_until_ready is
        # not a reliable sync point through the experimental TPU tunnel.
        return jnp.sum(y.astype(jnp.float32)) + jnp.sum(
            m.astype(jnp.float32))

    x = jax.random.uniform(jax.random.key(1),
                           (BATCH, SIZE, SIZE, 3), jnp.bfloat16) * 2 - 1
    return stacked, v1, v2, x


def main():
    stacked, v1, v2, x = build()
    for _ in range(WARMUP):
        float(stacked(v1, v2, x))  # host readback = hard sync

    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(stacked(v1, v2, x))
    dt = time.perf_counter() - t0

    ips = ITERS * BATCH / dt
    print(json.dumps({
        "metric": "stacked G1+G2 inference images/sec @256x256 (bf16)",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / ESTIMATED_REFERENCE_GPU_IPS, 3),
    }))


if __name__ == "__main__":
    main()
