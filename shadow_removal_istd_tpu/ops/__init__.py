"""TPU-first image compute ops.

Design notes
------------
Separable resampling (resize) is expressed as two dense matmuls so it runs
on the MXU with exact, precomputed weights (linear / area kernels matching
OpenCV's ``INTER_LINEAR`` / ``INTER_AREA`` conventions used by the
reference, src/transform.py:68,174). Spatially-varying resampling (rotate /
scale warps) is a bilinear gather; the fused augmentation pipeline composes
scale, rotation, horizontal flip and crop into a single inverse-affine
gather so each training image is resampled exactly once.
"""

from shadow_removal_istd_tpu.ops.resize import (  # noqa: F401
    resize,
    resize_area,
    resize_linear,
    resize_matrix_area,
    resize_matrix_linear,
)
from shadow_removal_istd_tpu.ops.warp import (  # noqa: F401
    affine_warp,
    invert_affine,
    rotation_scale_matrix,
)
from shadow_removal_istd_tpu.ops.color import (  # noqa: F401
    bgr_to_rgb,
    rgb_to_lab,
    srgb_to_linear,
)
