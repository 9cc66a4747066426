"""Metric kernels (JAX, batched, on-device capable).

Formulas match reference src/eval.py exactly:

- RMSE (eval.py:127-129): sum over masked pixels of the per-pixel
  Euclidean distance in LAB. (Despite the name there is no square root
  of a mean — it is the summed per-pixel L2 norm, the standard ISTD
  protocol.)
- MAE (eval.py:123-124): sum of absolute LAB differences over masked
  pixels (all channels summed).
- Aggregation (eval.py:104-111): dataset sums divided by dataset pixel
  counts, for the shadow mask, its complement, and all pixels.
- PSNR (eval.py:132-134): skimage convention; for [0,1] float images
  data_range=1.
- SSIM (eval.py:137-138): skimage structural_similarity with
  multichannel=True defaults — 7x7 uniform window, K1=.01, K2=.03,
  sample covariance, and data_range=2 (the float dtype range (-1,1)
  skimage assumes when not told otherwise).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def lab_rmse(lab1: jnp.ndarray, lab2: jnp.ndarray,
             mask: jnp.ndarray) -> jnp.ndarray:
    """Summed per-pixel LAB Euclidean distance over masked pixels.

    lab1/lab2: (..., H, W, 3); mask: (..., H, W) boolean.
    """
    dist = jnp.sqrt(jnp.sum((lab1 - lab2) ** 2, axis=-1))
    return jnp.sum(dist * mask)


def lab_mae(lab1: jnp.ndarray, lab2: jnp.ndarray,
            mask: jnp.ndarray) -> jnp.ndarray:
    """Summed absolute LAB difference over masked pixels (all channels)."""
    diff = jnp.sum(jnp.abs(lab1 - lab2), axis=-1)
    return jnp.sum(diff * mask)


def region_metrics(lab1: jnp.ndarray, lab2: jnp.ndarray,
                   mask: jnp.ndarray) -> dict:
    """Per-image (or per-batch) sums + pixel counts for later dataset
    aggregation, shadow/non-shadow split."""
    mask = mask.astype(lab1.dtype)
    inv = 1.0 - mask
    return {
        "rmse_sum": lab_rmse(lab1, lab2, mask),
        "mae_sum": lab_mae(lab1, lab2, mask),
        "pixels": jnp.sum(mask),
        "rmse_non_sum": lab_rmse(lab1, lab2, inv),
        "mae_non_sum": lab_mae(lab1, lab2, inv),
        "pixels_non": jnp.sum(inv),
    }


def aggregate_regions(parts: list[dict]) -> dict:
    """Σerr/Σpixels over the dataset (reference eval.py:104-111)."""
    tot = {k: float(np.sum([float(p[k]) for p in parts]))
           for k in parts[0]}

    def div(a, b):
        # maskless runs have zero non-shadow pixels; the reference's
        # numpy division yields nan there rather than raising
        return a / b if b else float("nan")

    return {
        "rmse": div(tot["rmse_sum"], tot["pixels"]),
        "mae": div(tot["mae_sum"], tot["pixels"]),
        "rmse_non": div(tot["rmse_non_sum"], tot["pixels_non"]),
        "mae_non": div(tot["mae_non_sum"], tot["pixels_non"]),
        "rmse_all": div(tot["rmse_sum"] + tot["rmse_non_sum"],
                        tot["pixels"] + tot["pixels_non"]),
        "mae_all": div(tot["mae_sum"] + tot["mae_non_sum"],
                       tot["pixels"] + tot["pixels_non"]),
    }


def psnr(img1: jnp.ndarray, img2: jnp.ndarray,
         data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (dB)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _uniform_filter_valid(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Valid-mode uniform box filter over a (H, W) array, computed with
    separable cumulative sums (O(HW), no convolution)."""
    def box1d(a, axis):
        c = jnp.cumsum(a, axis=axis)
        pad = [(0, 0)] * a.ndim
        pad[axis] = (1, 0)
        c = jnp.pad(c, pad)
        n = a.shape[axis]
        hi = jnp.take(c, jnp.arange(win, n + 1), axis=axis)
        lo = jnp.take(c, jnp.arange(0, n + 1 - win), axis=axis)
        return (hi - lo) / win
    x = box1d(x, 0)
    x = box1d(x, 1)
    return x


def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         data_range: float = 2.0, win_size: int = 7,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Structural similarity (skimage defaults, multichannel mean).

    img1/img2: (H, W, C) floats. Uniform 7x7 window, sample-covariance
    normalization, boundary crop — exactly skimage's non-gaussian path.
    """
    np_win = win_size ** 2
    cov_norm = np_win / (np_win - 1.0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    def channel_ssim(a, b):
        ua = _uniform_filter_valid(a, win_size)
        ub = _uniform_filter_valid(b, win_size)
        uaa = _uniform_filter_valid(a * a, win_size)
        ubb = _uniform_filter_valid(b * b, win_size)
        uab = _uniform_filter_valid(a * b, win_size)
        va = cov_norm * (uaa - ua * ua)
        vb = cov_norm * (ubb - ub * ub)
        vab = cov_norm * (uab - ua * ub)
        num = (2 * ua * ub + c1) * (2 * vab + c2)
        den = (ua ** 2 + ub ** 2 + c1) * (va + vb + c2)
        return jnp.mean(num / den)

    chans = [channel_ssim(img1[..., c], img2[..., c])
             for c in range(img1.shape[-1])]
    return jnp.mean(jnp.stack(chans))
