"""Independent-oracle check of the full ISTD eval protocol.

skimage isn't installed in this environment, so the reference's own
stack (src/eval.py: skimage io/resize/rgb2lab) can't be run directly.
Instead this file re-implements each skimage primitive the protocol
uses FROM ITS PUBLISHED SPEC in plain numpy/scipy — a second,
independent implementation sharing no code with the package under test:

- ``transform.resize(order=1, mode="edge", anti_aliasing=False)``:
  half-pixel-center bilinear, src = (i+0.5)*in/out - 0.5, edge-clamped
  (scipy map_coordinates order=1 mode="nearest").
- mask path: default anti-aliasing on downscale = gaussian pre-filter
  with sigma = max(0, (factor-1)/2) per axis (mode "nearest" for
  "edge"), then resize, then the img_as_bool 0.5 threshold.
- ``color.rgb2lab``: sRGB linearization (0.04045/12.92 split), the
  sRGB->XYZ D65 matrix, CIE f(t) with the 0.008856/7.787 piecewise.
- RMSE/MAE region sums per src/eval.py:120-128 and the Σerr/Σpixels
  dataset aggregation (src/eval.py:104-115).

The whole-protocol test then runs the package's eval CLI over a
synthetic PNG split and asserts it reproduces the oracle's numbers.
"""
import os

import numpy as np
import pytest
from scipy import ndimage

from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics

# ---------------- oracle (independent implementation) -----------------

_SRGB_TO_XYZ = np.array(
    [[0.412456439089692, 0.357576077643909, 0.180437483266399],
     [0.212672851405623, 0.715152155287818, 0.072174993306560],
     [0.019333895582329, 0.119192025881303, 0.950304078536368]],
    dtype=np.float64)
_D65_WHITE = np.array([0.95047, 1.0, 1.08883], dtype=np.float64)


def oracle_rgb2lab(rgb01: np.ndarray) -> np.ndarray:
    rgb = rgb01.astype(np.float64)
    lin = np.where(rgb > 0.04045,
                   ((rgb + 0.055) / 1.055) ** 2.4,
                   rgb / 12.92)
    xyz = lin @ _SRGB_TO_XYZ.T
    t = xyz / _D65_WHITE
    f = np.where(t > 0.008856, np.cbrt(t), 7.787 * t + 16.0 / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return np.stack([L, a, b], axis=-1)


def oracle_resize(img: np.ndarray, out_shape) -> np.ndarray:
    """skimage.transform.resize(order=1, mode='edge',
    anti_aliasing=False) spec."""
    in_h, in_w = img.shape[:2]
    out_h, out_w = out_shape
    rows = (np.arange(out_h) + 0.5) * in_h / out_h - 0.5
    cols = (np.arange(out_w) + 0.5) * in_w / out_w - 0.5
    rr, cc = np.meshgrid(rows, cols, indexing="ij")
    if img.ndim == 2:
        return ndimage.map_coordinates(img.astype(np.float64), [rr, cc],
                                       order=1, mode="nearest")
    chans = [ndimage.map_coordinates(img[..., c].astype(np.float64),
                                     [rr, cc], order=1, mode="nearest")
             for c in range(img.shape[-1])]
    return np.stack(chans, axis=-1)


def oracle_mask_resize(mask01: np.ndarray, out_shape) -> np.ndarray:
    """resize with default anti_aliasing (on for downscale) +
    img_as_bool threshold."""
    factors = (mask01.shape[0] / out_shape[0],
               mask01.shape[1] / out_shape[1])
    m = mask01.astype(np.float64)
    if max(factors) > 1.0:
        sigma = [max(0.0, (f - 1.0) / 2.0) for f in factors]
        m = ndimage.gaussian_filter(m, sigma, mode="nearest")
    return oracle_resize(m, out_shape) > 0.5


def oracle_all_metrics(dir1, dir2, maskdir, size):
    """Transcription of src/eval.py:41-115 on the oracle primitives."""
    import cv2

    def load_rgb01(p):
        return cv2.imread(p)[..., ::-1].astype(np.float64) / 255.0

    sums = dict.fromkeys(
        ["rmse", "mae", "rmse_non", "mae_non", "px", "px_non"], 0.0)
    for f in sorted(os.listdir(dir1)):
        img1 = load_rgb01(os.path.join(dir1, f))
        img2 = oracle_resize(load_rgb01(os.path.join(dir2, f)),
                             img1.shape[:2])
        mask = cv2.imread(os.path.join(maskdir, f),
                          cv2.IMREAD_GRAYSCALE).astype(np.float64) / 255.0
        if size is not None:
            img1 = oracle_resize(img1, (size, size))
            img2 = oracle_resize(img2, (size, size))
            mask_b = oracle_mask_resize(mask, (size, size))
        else:
            mask_b = mask > 0.5
        lab1, lab2 = oracle_rgb2lab(img1), oracle_rgb2lab(img2)
        dist = np.sqrt(np.sum((lab1 - lab2) ** 2, axis=-1))
        adiff = np.sum(np.abs(lab1 - lab2), axis=-1)
        sums["rmse"] += dist[mask_b].sum()
        sums["mae"] += adiff[mask_b].sum()
        sums["rmse_non"] += dist[~mask_b].sum()
        sums["mae_non"] += adiff[~mask_b].sum()
        sums["px"] += mask_b.sum()
        sums["px_non"] += (~mask_b).sum()
    return {
        "rmse": sums["rmse"] / sums["px"],
        "mae": sums["mae"] / sums["px"],
        "rmse_non": sums["rmse_non"] / sums["px_non"],
        "mae_non": sums["mae_non"] / sums["px_non"],
        "rmse_all": (sums["rmse"] + sums["rmse_non"])
        / (sums["px"] + sums["px_non"]),
        "mae_all": (sums["mae"] + sums["mae_non"])
        / (sums["px"] + sums["px_non"]),
    }


# ------------------------------ fixtures ------------------------------

@pytest.fixture(scope="module")
def eval_split(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("evalsplit")
    d1, d2, dm = root / "pred", root / "gt", root / "mask"
    for d in (d1, d2, dm):
        d.mkdir()
    rng = np.random.default_rng(11)
    for i in range(3):
        a = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
        shift = rng.integers(-25, 25, (48, 64, 3))
        b = np.clip(a.astype(int) + shift, 0, 255).astype(np.uint8)
        # smooth gray mask so the antialias+threshold path is exercised
        m = ndimage.gaussian_filter(
            rng.random((48, 64)) * 255, 4).astype(np.uint8)
        cv2.imwrite(str(d1 / f"{i}.png"), a)
        cv2.imwrite(str(d2 / f"{i}.png"), b)
        cv2.imwrite(str(dm / f"{i}.png"), m)
    return str(d1), str(d2), str(dm)


# ------------------------------- tests --------------------------------

def test_resize_matches_oracle(eval_split):
    from shadow_removal_istd_tpu.metrics.eval_cli import _resize

    rng = np.random.default_rng(0)
    img = rng.random((48, 64, 3)).astype(np.float32)
    for shape in [(32, 32), (96, 128), (48, 64), (17, 23)]:
        got = _resize(img, shape)
        want = oracle_resize(img, shape)
        np.testing.assert_allclose(got, want, atol=2e-5)


def test_mask_antialias_matches_oracle(eval_split):
    from shadow_removal_istd_tpu.metrics.eval_cli import _antialias_mask

    rng = np.random.default_rng(1)
    mask = ndimage.gaussian_filter(rng.random((48, 64)), 3)
    got = _antialias_mask(mask.astype(np.float32), (32, 32)) > 0.5
    want = oracle_mask_resize(mask, (32, 32))
    # allow a disagreement ring only where the filtered value is ~0.5
    disagree = got != want
    assert disagree.mean() < 0.002, f"{disagree.sum()} px differ"


def test_rgb2lab_matches_oracle():
    from shadow_removal_istd_tpu.ops.color import rgb_to_lab

    rng = np.random.default_rng(2)
    rgb = rng.random((8, 8, 3)).astype(np.float32)
    got = np.asarray(rgb_to_lab(rgb))
    np.testing.assert_allclose(got, oracle_rgb2lab(rgb), atol=2e-3)


@pytest.mark.parametrize("size", [None, 32])
def test_whole_protocol_matches_oracle(eval_split, size):
    d1, d2, dm = eval_split
    got = all_metrics(d1, d2, size=size, maskdir=dm)
    want = oracle_all_metrics(d1, d2, dm, size)
    for k, v in want.items():
        assert abs(got[k] - v) < 5e-3 * max(1.0, abs(v)), \
            f"{k}: {got[k]} vs oracle {v}"
