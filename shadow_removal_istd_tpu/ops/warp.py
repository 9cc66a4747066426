"""Inverse-affine bilinear warps.

The reference augments with ``cv.warpAffine`` driven by
``cv.getRotationMatrix2D(center, angle, scale)`` (src/transform.py:71-74,
94-96): rotation by ``angle`` degrees CCW and isotropic scaling about the
image center ``((cols-1)/2, (rows-1)/2)`` with constant-zero border.

Here the warp is expressed the XLA-friendly way: for every output pixel we
compute source coordinates with the *inverse* transform and bilinear-gather
four neighbours, masking out-of-bounds taps to zero. The output grid may be
offset/flipped, which is how the fused augmentation pipeline folds the
random crop and horizontal flip into the same single gather.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_scale_matrix(angle_deg, scale, center):
    """Forward 2x3 affine equal to cv.getRotationMatrix2D.

    Maps source (x, y) -> destination. ``center`` is (cx, cy) in (col, row)
    coordinates. Entries: [[a, b, (1-a)cx - b*cy], [-b, a, b*cx + (1-a)cy]]
    with a = scale*cos(angle), b = scale*sin(angle).
    """
    theta = jnp.deg2rad(angle_deg)
    a = scale * jnp.cos(theta)
    b = scale * jnp.sin(theta)
    cx, cy = center
    return jnp.array(
        [[a, b, (1.0 - a) * cx - b * cy],
         [-b, a, b * cx + (1.0 - a) * cy]]
    )


def invert_affine(m):
    """Invert a 2x3 affine matrix (returns 2x3)."""
    a, b, tx = m[0, 0], m[0, 1], m[0, 2]
    c, d, ty = m[1, 0], m[1, 1], m[1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    return jnp.array(
        [[ia, ib, -(ia * tx + ib * ty)],
         [ic, id_, -(ic * tx + id_ * ty)]]
    )


def affine_warp(img: jnp.ndarray, inv_matrix: jnp.ndarray,
                out_shape: tuple[int, int] | None = None,
                offset=(0.0, 0.0), flip: jnp.ndarray | bool = False):
    """Bilinear warp of an (H, W, C) image with zero border.

    ``inv_matrix`` (2x3) maps destination (x, y) -> source (x, y) — the
    inverse transform, matching cv.warpAffine's internal inversion of the
    forward matrix. ``out_shape`` = (rows, cols) of the output (defaults to
    input). ``offset`` = (row0, col0) places the output grid inside the
    pre-warp destination plane (used for fused cropping). ``flip`` mirrors
    the destination columns before sampling (fused horizontal flip).
    """
    h, w = img.shape[0], img.shape[1]
    oh, ow = out_shape if out_shape is not None else (h, w)

    rows = jnp.arange(oh, dtype=jnp.float32) + offset[0]
    cols = jnp.arange(ow, dtype=jnp.float32) + offset[1]
    # Horizontal flip of the *destination* plane (width w), applied before
    # cropping: dst column c samples pre-flip column (w-1-c).
    flip = jnp.asarray(flip)
    cols = jnp.where(flip, (w - 1.0) - cols, cols)
    xg, yg = jnp.meshgrid(cols, rows)  # (oh, ow) dest x(col), y(row)

    xs = inv_matrix[0, 0] * xg + inv_matrix[0, 1] * yg + inv_matrix[0, 2]
    ys = inv_matrix[1, 0] * xg + inv_matrix[1, 1] * yg + inv_matrix[1, 2]

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]  # (oh, ow, C) gather
        return vals * valid[..., None].astype(img.dtype)

    w00 = ((1 - fy) * (1 - fx))[..., None].astype(img.dtype)
    w01 = ((1 - fy) * fx)[..., None].astype(img.dtype)
    w10 = (fy * (1 - fx))[..., None].astype(img.dtype)
    w11 = (fy * fx)[..., None].astype(img.dtype)

    out = (tap(y0i, x0i) * w00 + tap(y0i, x0i + 1) * w01
           + tap(y0i + 1, x0i) * w10 + tap(y0i + 1, x0i + 1) * w11)
    return out
