"""Model registry — same string keys as the reference.

Reference: src/networks.py:33-54 (Generators/Discriminators enums and the
case-insensitive factories). ``stcgan`` maps to the pix2pix U-Net G and
the NLayer D, as there.
"""

from __future__ import annotations

from typing import Any

from shadow_removal_istd_tpu.models.began import BEGAN
from shadow_removal_istd_tpu.models.denseunet import DenseUNet
from shadow_removal_istd_tpu.models.dummy import DummyNet
from shadow_removal_istd_tpu.models.mnet import MNet
from shadow_removal_istd_tpu.models.patchgan import PatchGAN
from shadow_removal_istd_tpu.models.pix2pix import (
    NLayerDiscriminator,
    Pix2PixUNet,
)
from shadow_removal_istd_tpu.models.unet import UNet

GENERATORS = {
    "unet": UNet,
    "mnet": MNet,
    "denseunet": DenseUNet,
    "stcgan": Pix2PixUNet,
}

DISCRIMINATORS = {
    "patchgan": PatchGAN,
    "began": BEGAN,
    "stcgan": NLayerDiscriminator,
    "dummy": DummyNet,
}


def get_generator(key: str, **kwargs: Any):
    """Instantiate a generator module by registry key (case-insensitive)."""
    return GENERATORS[key.lower()](**kwargs)


def get_discriminator(key: str, **kwargs: Any):
    """Instantiate a discriminator module by registry key."""
    cls = DISCRIMINATORS[key.lower()]
    if cls is DummyNet:
        kwargs.setdefault("out_channels", 1)
    return cls(**kwargs)
