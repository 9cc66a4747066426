"""Color-space conversions (sRGB -> CIELAB, D65).

The evaluation protocol measures errors in LAB space via skimage's
``color.rgb2lab`` (reference: src/eval.py:86-99). This implements the same
math — sRGB linearization (threshold 0.04045), the sRGB->XYZ D65 matrix,
and the CIE f(t) cube-root with the 0.008856 threshold — as pure JAX so
the metric runs on-device over whole batches.

Training images flow in BGR channel order end-to-end (cv2 convention,
reference: src/dataset.py:100); eval reads RGB (skimage). ``bgr_to_rgb``
converts between the two worlds.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# sRGB (linear) -> XYZ, D65 white point. skimage defines rgb_from_xyz
# (the 3.2404542... matrix) and inverts it at float64
# (colorconv.xyz_from_rgb = inv(rgb_from_xyz)) — these are that inverse
# to full float32 precision, NOT the older rounded 0.412453... matrix
# (which differs by ~0.004 LAB units).
# Plain numpy, NOT jnp: a module-level jnp.array would initialize the
# jax backend at import time, before a CLI's main() can pick the
# platform (jnp ops close over these and convert at trace time).
_XYZ_FROM_RGB = np.array(
    [[0.412456432268236, 0.357576076280027, 0.180437480294450],
     [0.212672846318362, 0.715152167154881, 0.072174999573213],
     [0.019333904103299, 0.119192028243221, 0.950304073677404]],
    dtype=np.float32)

# D65 reference white (skimage "D65", 2-degree observer).
_WHITE_D65 = np.array([0.95047, 1.0, 1.08883], dtype=np.float32)


def bgr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """Swap the channel order of a (..., 3) image."""
    return img[..., ::-1]


def srgb_to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse sRGB companding on values in [0, 1]."""
    return jnp.where(
        srgb > 0.04045,
        ((srgb + 0.055) / 1.055) ** 2.4,
        srgb / 12.92,
    )


def rgb_to_xyz(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) sRGB in [0,1] -> XYZ.

    Written as explicit multiply-adds (VPU work) rather than a matmul:
    JAX's default matmul precision truncates operands to bfloat16 on the
    MXU, which costs ~0.2 LAB units — too much for the eval metric.
    """
    linear = srgb_to_linear(rgb)
    r, g, b = linear[..., 0], linear[..., 1], linear[..., 2]
    m = _XYZ_FROM_RGB
    x = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
    y = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
    z = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b
    return jnp.stack([x, y, z], axis=-1)


def xyz_to_lab(xyz: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) XYZ -> CIELAB (L in [0,100])."""
    t = xyz / _WHITE_D65
    eps = 0.008856  # (6/29)^3
    kappa_term = 7.787 * t + 16.0 / 116.0
    f = jnp.where(t > eps, jnp.cbrt(t), kappa_term)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    lum = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    b = 200.0 * (fy - fz)
    return jnp.stack([lum, a, b], axis=-1)


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) sRGB in [0,1] -> CIELAB, matching skimage.color.rgb2lab."""
    return xyz_to_lab(rgb_to_xyz(rgb))
