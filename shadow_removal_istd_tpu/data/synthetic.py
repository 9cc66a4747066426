"""Synthetic ISTD-like data for tests and benchmarks.

Generates structured (not pure-noise) triplets: a base image, a smooth
shadow matte, and the "shadow-free" target derived by dividing out the
shadow — so supervised losses have real signal to fit.
"""

from __future__ import annotations

import os

import numpy as np


def synthetic_triplets(n: int = 8, h: int = 480, w: int = 640,
                       seed: int = 0):
    """Return dict of uint8 arrays {img (N,H,W,3), mask (N,H,W,1),
    matte (N,H,W,1), target (N,H,W,3)} resembling ISTD samples."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    imgs, masks, mattes, targets = [], [], [], []
    for i in range(n):
        # smooth background
        base = (0.4 + 0.4 * np.sin(xx / (20 + 10 * (i % 3)) + i)
                * np.cos(yy / (25 + 5 * (i % 4))))
        img = np.stack([base * c for c in
                        rng.uniform(0.6, 1.0, 3).astype(np.float32)], -1)
        img += rng.normal(0, 0.02, img.shape).astype(np.float32)
        # elliptical soft shadow
        cy, cx = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
        ry, rx = rng.uniform(0.1, 0.3) * h, rng.uniform(0.1, 0.3) * w
        d = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2
        matte = np.clip(1.0 - d, 0.0, 1.0).astype(np.float32)
        shadowed = img * (1.0 - 0.6 * matte[..., None])
        target = img
        imgs.append(np.clip(shadowed, 0, 1))
        masks.append((matte > 0.05).astype(np.float32))
        mattes.append(matte)
        targets.append(np.clip(target, 0, 1))

    to_u8 = lambda a: (np.stack(a) * 255).astype(np.uint8)  # noqa: E731
    return {
        "img": to_u8(imgs),
        "mask": to_u8(masks)[..., None],
        "matte": to_u8(mattes)[..., None],
        "target": to_u8(targets),
    }


def write_istd_layout(root: str, n_train: int = 4, n_test: int = 2,
                      h: int = 96, w: int = 128, seed: int = 0) -> None:
    """Materialize a synthetic ISTD directory tree (for CLI/e2e tests)."""
    from shadow_removal_istd_tpu.utils.image_io import imwrite

    for subset, n in (("train", n_train), ("test", n_test)):
        data = synthetic_triplets(n, h, w, seed=seed + (subset == "test"))
        dirs = {
            "img": f"{subset}_A", "mask": f"{subset}_B",
            "matte": f"{subset}_matte", "target": f"{subset}_C_fixed",
        }
        for stream, d in dirs.items():
            path = os.path.join(root, subset, d)
            os.makedirs(path, exist_ok=True)
            for i in range(n):
                arr = data[stream][i]
                if arr.shape[-1] == 1:
                    arr = arr[..., 0]
                imwrite(os.path.join(path, f"{i:03d}-{subset}.png"), arr)
