"""Standalone eval CLI — the ISTD metric protocol.

Same interface and math as reference src/eval.py: compare two image
directories (predictions vs ground truth), optionally with a shadow-mask
directory, reporting LAB RMSE/MAE over shadow / non-shadow / all regions
(Σerr/Σpixels over the dataset), or PSNR/SSIM when maskless.

Usage: python -m shadow_removal_istd_tpu.metrics.eval_cli DIR1 DIR2 \
           [-m MASKDIR] [--image-size 256] [--logfile ./eval.log]

Implementation notes vs the reference:
- images load as RGB floats (the reference uses skimage io; here
  imageio/cv2) and resize with the same half-pixel edge-clamped bilinear
  (anti_aliasing=False, like eval.py:74-77);
- the mask path applies the gaussian anti-aliasing skimage would apply
  by default before the 0.5 binarization threshold (eval.py:80-81);
- LAB conversion is the exact skimage math (ops/color.py).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import jax.numpy as jnp
import numpy as np

from shadow_removal_istd_tpu.ops.color import rgb_to_lab
from shadow_removal_istd_tpu.ops.resize import resize_linear
from shadow_removal_istd_tpu.metrics.metrics import (
    aggregate_regions,
    psnr,
    region_metrics,
    ssim,
)
from shadow_removal_istd_tpu.utils.image_io import imread_color, imread_gray

logger = logging.getLogger(__name__)


def _load_rgb01(path: str) -> np.ndarray:
    bgr = imread_color(path)
    return bgr[..., ::-1].astype(np.float32) / 255.0


def _resize(img: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    if img.shape[:2] == tuple(shape):
        return img
    arr = img if img.ndim == 3 else img[..., None]
    out = np.asarray(resize_linear(jnp.asarray(arr), shape))
    return out if img.ndim == 3 else out[..., 0]


def _antialias_mask(mask: np.ndarray, out_shape: tuple[int, int]):
    """Downscale a float mask with the gaussian pre-filter skimage's
    resize applies by default, then bilinear resize."""
    factors = (mask.shape[0] / out_shape[0], mask.shape[1] / out_shape[1])
    if max(factors) > 1.0:
        from scipy import ndimage
        sigma = [max(0.0, (f - 1.0) / 2.0) for f in factors]
        mask = ndimage.gaussian_filter(mask, sigma, mode="nearest")
    return _resize(mask, out_shape)


def all_metrics(dir1: str, dir2: str, size: int | None = None,
                maskdir: str | None = None,
                batch_size: int = 16) -> dict:
    """Dataset metrics per the reference protocol (src/eval.py:41-115).

    When every image in the split shares one resolution (ISTD does),
    the LAB metric runs batched on device — one dispatch per
    ``batch_size`` images instead of per image.
    """
    files = sorted(os.listdir(dir1))
    if maskdir is not None and batch_size > 1:
        batched = _try_all_metrics_batched(dir1, dir2, maskdir, files,
                                           size, batch_size)
        if batched is not None:
            return batched
    parts = []
    psnrs, ssims = [], []
    for f in files:
        img1 = _load_rgb01(os.path.join(dir1, f))
        img2 = _resize(_load_rgb01(os.path.join(dir2, f)), img1.shape[:2])
        if maskdir is not None:
            mask = imread_gray(
                os.path.join(maskdir, f)).astype(np.float32) / 255.0
            # the reference resizes the mask here with skimage's
            # DEFAULT anti-aliasing (eval.py:68-70 passes no
            # anti_aliasing flag -> gaussian prefilter on downscale)
            mask = _antialias_mask(mask, img1.shape[:2])
        else:
            mask = np.ones(img1.shape[:2], np.float32)
        if size is not None:
            target = (size, size)
            img1_r = _resize(img1, target)
            img2_r = _resize(img2, target)
            mask_r = _antialias_mask(mask, target) > 0.5
        else:
            img1_r, img2_r, mask_r = img1, img2, mask > 0.5

        lab1 = rgb_to_lab(jnp.asarray(img1_r))
        lab2 = rgb_to_lab(jnp.asarray(img2_r))
        parts.append({k: float(v) for k, v in
                      region_metrics(lab1, lab2,
                                     jnp.asarray(mask_r)).items()})
        if maskdir is None:
            psnrs.append(float(psnr(jnp.asarray(img1), jnp.asarray(img2))))
            ssims.append(float(ssim(jnp.asarray(img1), jnp.asarray(img2))))

    results = aggregate_regions(parts)
    if maskdir is None:
        results["psnr"] = float(np.mean(psnrs))
        results["ssim"] = float(np.mean(ssims))
    return results


def _image_shape(path: str) -> tuple[int, int]:
    """(H, W) without a full decode where possible: PNG IHDR probe
    (width/height big-endian at bytes 16-24); full decode otherwise."""
    with open(path, "rb") as f:
        head = f.read(26)
    if head[:8] == b"\x89PNG\r\n\x1a\n" and len(head) >= 24:
        w = int.from_bytes(head[16:20], "big")
        h = int.from_bytes(head[20:24], "big")
        return (h, w)
    return imread_color(path).shape[:2]


def _try_all_metrics_batched(dir1, dir2, maskdir, files, size,
                             batch_size):
    """Batched on-device path; returns None when shapes are mixed.

    Mixed resolutions are detected with a header probe BEFORE any
    decoding, so the per-image fallback never repeats work this path
    already did."""
    import jax

    shapes = {_image_shape(os.path.join(dir1, f)) for f in files}
    if len(shapes) != 1:
        return None  # mixed resolutions: per-image path
    hw = next(iter(shapes))

    @jax.jit
    def run(a, b, m):
        return region_metrics(rgb_to_lab(a), rgb_to_lab(b), m)

    parts = []
    for start in range(0, len(files), batch_size):
        chunk = files[start:start + batch_size]
        imgs1, imgs2, masks = [], [], []
        for f in chunk:
            i1 = _load_rgb01(os.path.join(dir1, f))
            i2 = _resize(_load_rgb01(os.path.join(dir2, f)), hw)
            mask = imread_gray(
                os.path.join(maskdir, f)).astype(np.float32) / 255.0
            mask = _antialias_mask(mask, hw)  # skimage-default AA
            if size is not None:
                i1 = _resize(i1, (size, size))
                i2 = _resize(i2, (size, size))
                mask = _antialias_mask(mask, (size, size))
            imgs1.append(i1)
            imgs2.append(i2)
            masks.append(mask > 0.5)
        out = run(jnp.asarray(np.stack(imgs1)),
                  jnp.asarray(np.stack(imgs2)),
                  jnp.asarray(np.stack(masks)))
        parts.append({k: float(v) for k, v in out.items()})
    return aggregate_regions(parts)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Evaluate errors")
    parser.add_argument("dir1", type=str)
    parser.add_argument("dir2", type=str)
    parser.add_argument("-m", "--maskdir", default=None,
                        help="mask directory (default: %(default)s)")
    parser.add_argument("--image-size", default=256, type=int,
                        help="target image size (default: %(default)d)")
    parser.add_argument("--logfile", default="./eval.log")
    args = parser.parse_args(argv)

    from shadow_removal_istd_tpu.cli.main import _sync_platform_env
    _sync_platform_env()  # honor JAX_PLATFORMS under pre-imported jax
    from shadow_removal_istd_tpu.utils.logging_utils import setup_logging
    setup_logging(args.logfile)  # console + the requested log file,
    # like the reference's set_logger(args.logfile) (src/eval.py:166-172)
    # Snapshot args next to the logfile, not the cwd (the reference's
    # eval.py writes ./args.json wherever it runs — a quirk we fix).
    snap_dir = os.path.dirname(os.path.abspath(args.logfile))
    os.makedirs(snap_dir, exist_ok=True)
    with open(os.path.join(snap_dir, "eval_args.json"), "w") as fp:
        json.dump(vars(args), fp, indent=4, sort_keys=True)

    errors = all_metrics(args.dir1, args.dir2, size=args.image_size,
                         maskdir=args.maskdir)
    for k, v in errors.items():
        logger.info("%s: %s", k, v)
        print(f"{k}: {v}")
    return errors


if __name__ == "__main__":
    main()
