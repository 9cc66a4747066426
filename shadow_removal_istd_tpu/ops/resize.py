"""Resize as matrix multiplication.

A separable resize ``out = R_h @ img @ R_w^T`` where ``R_h`` (out_h, in_h)
and ``R_w`` (out_w, in_w) hold exact interpolation weights. On TPU this
maps the whole resample onto the MXU instead of scalar gather loops, and
the weight matrices are compile-time constants for static shapes.

Weight conventions match what the reference relies on:

- ``linear``: OpenCV ``INTER_LINEAR`` half-pixel mapping
  ``src = (dst + 0.5) * in/out - 0.5`` with edge clamping
  (reference: src/transform.py:176-178 uses cv.resize INTER_LINEAR;
  src/eval.py:64-66 uses skimage resize order=1 mode="edge", the same
  half-pixel + edge-clamp convention).
- ``area``: OpenCV ``INTER_AREA`` box-overlap averaging, exact for both
  integer and fractional downscale factors (reference:
  src/transform.py:173-174 picks INTER_AREA when shrinking).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def resize_matrix_linear(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear weight matrix, half-pixel convention."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) * (in_size / out_size) - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    hi = np.clip(lo + 1, 0, in_size - 1)
    lo = np.clip(lo, 0, in_size - 1)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, lo), 1.0 - frac)
    np.add.at(mat, (rows, hi), frac)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def resize_matrix_area(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) box-filter weight matrix (INTER_AREA downscale).

    Output pixel ``i`` averages source interval ``[i*r, (i+1)*r)`` with
    fractional end-pixels weighted by their overlap, ``r = in/out``.
    For upscaling OpenCV's INTER_AREA degenerates to nearest/bilinear-like
    behaviour; we fall back to the linear matrix there, as the reference
    only selects area when shrinking (src/transform.py:173-174).
    """
    if out_size >= in_size:
        return resize_matrix_linear(in_size, out_size)
    r = in_size / out_size
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        a, b = i * r, (i + 1) * r
        lo, hi = int(np.floor(a)), int(np.ceil(b))
        for j in range(lo, min(hi, in_size)):
            overlap = min(b, j + 1) - max(a, j)
            if overlap > 0:
                mat[i, j] = overlap / r
    return mat.astype(np.float32)


def _apply_separable(img: jnp.ndarray, rh: np.ndarray, rw: np.ndarray):
    """Apply row/col weight matrices to (..., H, W, C) images via matmuls.

    precision='highest' keeps the contraction in full float32: JAX's
    default matmul precision feeds the MXU bfloat16 operands, which is
    fine for augmentation but not for eval-grade resampling.
    """
    rh = jnp.asarray(rh, img.dtype)
    rw = jnp.asarray(rw, img.dtype)
    # (..., H, W, C) -> rows: contract H; cols: contract W.
    out = jnp.einsum("oh,...hwc->...owc", rh, img, precision="highest")
    out = jnp.einsum("pw,...owc->...opc", rw, out, precision="highest")
    return out


def resize_linear(img: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (rows, cols)."""
    h, w = img.shape[-3], img.shape[-2]
    return _apply_separable(
        img, resize_matrix_linear(h, size[0]), resize_matrix_linear(w, size[1])
    )


def resize_area(img: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Area (box) resize of (..., H, W, C) to (rows, cols)."""
    h, w = img.shape[-3], img.shape[-2]
    return _apply_separable(
        img, resize_matrix_area(h, size[0]), resize_matrix_area(w, size[1])
    )


def resize(img: jnp.ndarray, size: tuple[int, int],
           method: str = "auto") -> jnp.ndarray:
    """Resize (..., H, W, C) image(s) to ``size`` = (rows, cols).

    ``method="auto"`` replicates the reference's Resize transform: area
    when strictly shrinking in both dims, linear otherwise
    (reference: src/transform.py:169-178).
    """
    h, w = img.shape[-3], img.shape[-2]
    if method == "auto":
        method = "area" if (size[0] < h and size[1] < w) else "linear"
    if method == "linear":
        return resize_linear(img, size)
    if method == "area":
        return resize_area(img, size)
    raise ValueError(f"unknown resize method: {method}")
