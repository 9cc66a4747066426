#!/usr/bin/env python
"""Same-hardware sanity anchor: reference torch vs this framework, CPU.

``bench.py``'s ``vs_baseline`` compares TPU throughput against a
documented ESTIMATE of the reference's GPU throughput (no GPU exists
in this environment and the reference publishes no numbers). This
bench removes the estimate from one axis: it runs the REFERENCE's own
stacked MNet G1+G2 (torch, f32, NCHW — /root/reference/src/networks.py)
and this framework's stacked pair (jax, f32, NHWC) on the SAME host
CPU, identical shapes. The ratio is a measured apples-to-apples
runtime-efficiency anchor: if the jax side is >= the torch side on
identical hardware, the TPU speedup claimed elsewhere is all hardware
+ mapping, not a slow-reference artifact.

Usage: python benchmarks/cpu_reference_compare.py [--batch 4]
       [--size 256] [--iters 5] [--reference /root/reference]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def torch_stacked(reference_path: str, ngf: int):
    from benchmarks.common import stub_torchvision

    sys.path.insert(0, reference_path)
    stub_torchvision()
    import torch
    from src import networks as rn
    torch.manual_seed(0)
    kw = dict(drop_rate=0.0, no_conv_t=True, use_selu=False,
              activation="tanh")
    g1 = rn.get_generator("mnet", in_channels=3, out_channels=1,
                          ngf=ngf, **kw)
    g2 = rn.get_generator("mnet", in_channels=4, out_channels=3,
                          ngf=ngf, **kw)
    g1.eval()
    g2.eval()

    def fwd(x):
        with torch.no_grad():
            m = g1(x)
            y = g2(torch.cat((x, m), dim=1))
        return float(y.sum())

    return fwd, torch


def jax_stacked(ngf: int):
    import functools

    import jax.numpy as jnp

    from benchmarks.common import fill_params_bf16
    from shadow_removal_istd_tpu.models import get_generator

    g1 = get_generator("mnet", in_channels=3, out_channels=1, ngf=ngf)
    g2 = get_generator("mnet", in_channels=4, out_channels=3, ngf=ngf)
    # f32 fill: this bench compares f32-vs-f32 against torch CPU
    fill = functools.partial(fill_params_bf16, dtype=jnp.float32)
    return g1, g2, fill


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--reference", default="/root/reference")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")  # this bench is CPU-only
    import jax.numpy as jnp

    b, s = args.batch, args.size
    rng = np.random.default_rng(0)
    x_np = (rng.uniform(size=(b, s, s, 3)).astype(np.float32) * 2 - 1)

    # --- jax side (f32; NHWC — each side uses its native layout) -----
    g1, g2, fill = jax_stacked(args.ngf)
    v1 = fill(g1, (1, s, s, 3))
    v2 = fill(g2, (1, s, s, 4))

    @jax.jit
    def fwd(v1, v2, x):
        m = g1.apply(v1, x)
        y = g2.apply(v2, jnp.concatenate([x, m], axis=-1))
        return jnp.sum(y)

    xj = jnp.asarray(x_np)
    float(fwd(v1, v2, xj))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        float(fwd(v1, v2, xj))
    t_jax = time.perf_counter() - t0

    # --- torch side (f32, NCHW, the reference's own modules) ---------
    tfwd, torch = torch_stacked(args.reference, args.ngf)
    xt = torch.tensor(x_np).permute(0, 3, 1, 2).contiguous()
    tfwd(xt)  # warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        tfwd(xt)
    t_torch = time.perf_counter() - t0

    ips_jax = args.iters * b / t_jax
    ips_torch = args.iters * b / t_torch
    print(json.dumps({
        "metric": f"stacked G1+G2 CPU inference @{s}x{s} f32 batch{b}",
        "jax_img_per_s": round(ips_jax, 3),
        "torch_reference_img_per_s": round(ips_torch, 3),
        "jax_over_torch": round(ips_jax / ips_torch, 3),
        "host": f"{os.cpu_count()} cpu",
    }))


if __name__ == "__main__":
    main()
