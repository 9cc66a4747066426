"""Shadow-parameter (sp) preprocessing.

Two sp methods, selectable via ``--method``:

- ``ratio`` (reference default): sp = shadowless / shadowed per pixel,
  with zero shadowed pixels clamped to 1 before the divide (reference
  src/utils.py:45-47); ``apply_sp`` clip-multiplies to restore
  (src/utils.py:50-57).
- ``polyfit``: the reference's dormant richer sp (the commented-out
  weighted per-pixel polynomial fit, src/preprocess.py:18-24 +
  src/utils.py:17-44): for every pixel and channel, fit
  ``shadowless ~ poly(shadowed)`` of degree ``--deg`` over a
  ``--ksize`` neighborhood, weighted by a hat function of the
  shadow-free gray level times a pyramid distance weight. The
  reference drives one ``numpy.polynomial.polyfit`` per pixel through
  a multiprocessing ``Pool``; here the same weighted least squares is
  solved in closed form for ALL pixels at once (batched normal
  equations + pinv), hundreds of times faster and trivially
  jit-able. Output shape (H, W, 3, deg+1), coefficients low->high
  degree (numpy.polynomial convention); ``apply_sp_poly`` evaluates
  the polynomial to restore.

The CLI driver maps over ``<subset>_A`` vs
``<subset>_C_fixed_official`` and saves ``.npy`` files plus optional
restored images (reference src/preprocess.py:27-56).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from shadow_removal_istd_tpu.utils.image_io import imread_color, imwrite


def compute_sp(shadowed: np.ndarray, shadowless: np.ndarray) -> np.ndarray:
    """Per-pixel shadow parameters (float32)."""
    shadowed = shadowed.copy()
    shadowed[shadowed == 0] = 1
    return shadowless.astype(np.float32) / shadowed.astype(np.float32)


def apply_sp(shadowed: np.ndarray, sp: np.ndarray) -> np.ndarray:
    """Restore a shadow-free estimate: clip(sp * shadowed)."""
    if shadowed.dtype == np.uint8:
        return np.clip(sp * shadowed, 0, 255).astype(np.uint8)
    return np.clip(sp * shadowed, 0, 1).astype(np.float32)


# Hat weight over gray level (reference src/utils.py:17-18): ramps up
# over [0, 63], flat 64 over [64, 191], ramps down over [192, 255].
# Note the reference's own table gives weight 0 to gray 0 and 255.
_HAT_LUT = np.concatenate((np.arange(64), np.full(128, 64),
                           np.arange(64)[::-1])).astype(np.float64)


def _bgr_to_gray_u8(bgr: np.ndarray) -> np.ndarray:
    """BGR -> GRAY uint8 like the reference's ``cv.cvtColor``
    (src/utils.py:25): cv2 itself when installed; otherwise the
    classic fixed-point descale, which matches cv2 except for a ±1
    level on ~0.2% of pixels (cv2 5.x rounds in float)."""
    try:
        import cv2
        return cv2.cvtColor(np.ascontiguousarray(bgr),
                            cv2.COLOR_BGR2GRAY)
    except Exception:
        b = bgr[..., 0].astype(np.int64)
        g = bgr[..., 1].astype(np.int64)
        r = bgr[..., 2].astype(np.int64)
        return ((1868 * b + 9617 * g + 4899 * r + (1 << 13)) >> 14).astype(
            np.uint8)


def _pyramid_weight(ksize: int) -> np.ndarray:
    """Distance weight per window offset (reference
    src/utils.py:31-33): ksize - |di| - |dj| from the window center."""
    b = (ksize - 1) // 2
    i = np.abs(np.arange(ksize) - b)
    return (ksize - i[:, None] - i[None, :]).astype(np.float64)


def compute_sp_polyfit(shadowed: np.ndarray, shadowless: np.ndarray,
                       ksize: int = 5, deg: int = 1) -> np.ndarray:
    """Weighted per-pixel polynomial sp (reference's dormant variant,
    src/preprocess.py:18-24 / src/utils.py:17-44), all pixels at once.

    For each pixel p and channel c the reference fits (via
    ``numpy.polynomial.polynomial.polyfit``) coefficients minimizing
    ``sum_j w_j^2 (poly(x_j) - y_j)^2`` over the ksize x ksize
    replicate-bordered window around p, where x = shadowed, y =
    shadowless, and ``w = hat(gray(shadowless)) * pyramid(offset)``.
    That is a (deg+1)-dim weighted least squares per pixel; here the
    normal equations ``G a = h`` with ``G[ab] = sum w^2 x^(a+b)``,
    ``h[a] = sum w^2 x^a y`` are built from window moments and solved
    batched with a pseudo-inverse (min-norm solution where the window
    is degenerate, e.g. all-zero hat weight or a constant patch).

    Returns float32 (H, W, 3, deg+1), coefficients low->high degree.
    """
    assert shadowed.dtype == shadowless.dtype
    from numpy.lib.stride_tricks import sliding_window_view

    border = (ksize - 1) // 2  # ksize should be an odd number
    pad2 = ((border, border), (border, border))
    px = np.pad(shadowed, pad2 + ((0, 0),), mode="edge")
    py = np.pad(shadowless, pad2 + ((0, 0),), mode="edge")
    if shadowed.dtype == np.uint8:
        gray = _bgr_to_gray_u8(py)
    else:  # float input: scale to the LUT's 0..255 domain
        gray = _bgr_to_gray_u8(
            (np.clip(py, 0.0, 1.0) * 255.0).astype(np.uint8))
    w1 = _HAT_LUT[gray]

    # (H, W, 3, k, k) value windows / (H, W, 1, k, k) weights
    xw = sliding_window_view(px.astype(np.float64), (ksize, ksize),
                             axis=(0, 1))
    yw = sliding_window_view(py.astype(np.float64), (ksize, ksize),
                             axis=(0, 1))
    w = (sliding_window_view(w1, (ksize, ksize))
         * _pyramid_weight(ksize))[:, :, None, :, :]
    wsq = (w * w).astype(np.float64)

    # moments S_p = sum w^2 x^p (p <= 2*deg), T_p = sum w^2 x^p y
    n_coef = deg + 1
    xpow = np.ones_like(xw)
    S, T = [], []
    for p in range(2 * deg + 1):
        if p:
            xpow = xpow * xw
        S.append(np.sum(wsq * xpow, axis=(-2, -1)))
        if p <= deg:
            T.append(np.sum(wsq * xpow * yw, axis=(-2, -1)))
    G = np.stack([np.stack([S[a + b] for b in range(n_coef)], -1)
                  for a in range(n_coef)], -2)
    h = np.stack(T, -1)
    # batched direct solve for the well-conditioned bulk; the (much
    # slower) SVD pseudo-inverse runs only on degenerate windows
    # (all-zero hat weight, constant patch), where it gives the
    # min-norm solution. ~30x faster than pinv-everywhere at 480x640.
    Gf = G.reshape(-1, n_coef, n_coef)
    hf = h.reshape(-1, n_coef)
    det = np.linalg.det(Gf)
    hadamard = np.prod(np.sqrt((Gf * Gf).sum(-1)), axis=-1)
    ok = np.abs(det) > 1e-9 * np.maximum(hadamard, 1e-30)
    coef = np.zeros_like(hf)
    if ok.any():
        coef[ok] = np.linalg.solve(Gf[ok], hf[ok][..., None])[..., 0]
    if (~ok).any():
        coef[~ok] = np.einsum("...ij,...j->...i",
                              np.linalg.pinv(Gf[~ok]), hf[~ok])
    return coef.reshape(G.shape[:-2] + (n_coef,)).astype(np.float32)


def apply_sp_poly(shadowed: np.ndarray, sp: np.ndarray) -> np.ndarray:
    """Restore a shadow-free estimate by evaluating the polynomial sp
    (low->high coefficients) at each shadowed pixel value."""
    x = shadowed.astype(np.float64)
    out = np.zeros(shadowed.shape, np.float64)
    for k in range(sp.shape[-1] - 1, -1, -1):  # Horner
        out = out * x + sp[..., k].astype(np.float64)
    if shadowed.dtype == np.uint8:
        return np.clip(out, 0, 255).astype(np.uint8)
    return np.clip(out, 0, 1).astype(np.float32)


def process_split(root: str, subset: str, save_sp: bool = True,
                  save_img: bool = False,
                  target_dirname: str | None = None,
                  method: str = "ratio", ksize: int = 5,
                  deg: int = 1) -> int:
    """Compute sp for every aligned pair in a split; returns file count.

    ``method="ratio"`` writes into ``sp/`` + ``sp_restored_img/``
    (sp shape H,W,3 — what the HDF5 pipeline consumes);
    ``method="polyfit"`` writes into ``sp_poly/`` +
    ``sp_poly_restored_img/`` (shape H,W,3,deg+1) so the two methods'
    outputs never clobber each other.
    """
    image_dir = os.path.join(root, subset, f"{subset}_A")
    if target_dirname is None:
        target_dirname = f"{subset}_C_fixed_official"
        if not os.path.isdir(os.path.join(root, subset, target_dirname)):
            target_dirname = f"{subset}_C_fixed"
    target_dir = os.path.join(root, subset, target_dirname)
    sp_dir = os.path.join(root, subset,
                          "sp" if method == "ratio" else "sp_poly")
    restored_dir = os.path.join(
        root, subset, ("sp_restored_img" if method == "ratio"
                       else "sp_poly_restored_img"))
    if save_sp:
        os.makedirs(sp_dir, exist_ok=True)
    if save_img:
        os.makedirs(restored_dir, exist_ok=True)

    filenames = sorted(os.listdir(image_dir))
    for fname in filenames:
        img = imread_color(os.path.join(image_dir, fname))
        target = imread_color(os.path.join(target_dir, fname))
        if method == "ratio":
            sp = compute_sp(img, target)
            restored = apply_sp(img, sp) if save_img else None
        else:
            sp = compute_sp_polyfit(img, target, ksize=ksize, deg=deg)
            restored = apply_sp_poly(img, sp) if save_img else None
        stem = os.path.splitext(fname)[0]
        if save_sp:
            np.save(os.path.join(sp_dir, stem), sp)
        if save_img:
            imwrite(os.path.join(restored_dir, fname), restored)
    return len(filenames)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Preprocess shadow removal dataset")
    parser.add_argument("--path", default="../ISTD_DATASET")
    parser.add_argument("--subset", default="train",
                        choices=["train", "test"])
    # the reference uses type=bool here (src/preprocess.py), where any
    # non-empty string — including "false"/"no" — parses as True and
    # the flags cannot be switched off; fixed with a real bool parser
    # (PARITY.md quirk ledger)
    from shadow_removal_istd_tpu.cli.main import str2bool
    parser.add_argument("--save-sp", type=str2bool, nargs="?",
                        const=True, default=True)
    parser.add_argument("--save-img", type=str2bool, nargs="?",
                        const=True, default=False)
    parser.add_argument("--method", default="ratio",
                        choices=["ratio", "polyfit"],
                        help="ratio sp (reference default) or the "
                             "weighted polynomial fit (the reference's "
                             "dormant variant, src/utils.py:17-44)")
    parser.add_argument("--ksize", type=int, default=5,
                        help="polyfit neighborhood size (odd)")
    parser.add_argument("--deg", type=int, default=1,
                        help="polyfit polynomial degree")
    args = parser.parse_args(argv)
    n = process_split(args.path, args.subset, args.save_sp, args.save_img,
                      method=args.method, ksize=args.ksize, deg=args.deg)
    print(f"completed preprocessing of {n} files", file=sys.stderr)


if __name__ == "__main__":
    main()
