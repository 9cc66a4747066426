"""Host utilities: image IO, logging setup."""

from shadow_removal_istd_tpu.utils.image_io import (  # noqa: F401
    imread_color,
    imread_gray,
    imwrite,
)
