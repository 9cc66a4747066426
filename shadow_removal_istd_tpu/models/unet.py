"""U-Net generator (brain-segmentation-pytorch style).

Architecture parity with reference src/models/unet.py: depth-4 U-Net of
double 3x3 reflect-conv blocks (each conv followed by LeakyReLU+BN or
SELU), max-pool downsampling, 2x upsample + double conv on the skip
concatenation, and a final 1x1 conv + activation. ngf=64 default.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from shadow_removal_istd_tpu.models import layers as L


class _DoubleConv(nn.Module):
    """conv3x3 -> act/norm -> conv3x3 -> act/norm (reference unet.conv)."""

    features: int
    use_selu: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = L.ConvReflect(self.features, (3, 3), padding=1, use_bias=False,
                          dtype=self.dtype)(x)
        x = L.ActNorm(self.use_selu, dtype=self.dtype)(x, train)
        x = L.ConvReflect(self.features, (3, 3), padding=1, use_bias=False,
                          dtype=self.dtype)(x)
        x = L.ActNorm(self.use_selu, dtype=self.dtype)(x, train)
        return x


class UNet(nn.Module):
    out_channels: int
    in_channels: int | None = None
    ngf: int = 64
    drop_rate: float = 0.0
    no_conv_t: bool = False
    use_selu: bool = False
    activation: str | None = "tanh"
    depth: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # depth maxpool halvings, each undone by a 2x upsample: fail
        # early on indivisible sizes instead of a deep concat error
        div = 2 ** self.depth
        if x.shape[1] % div or x.shape[2] % div:
            raise ValueError(
                f"UNet(depth={self.depth}) needs H and W divisible by "
                f"{div}; got {x.shape[1]}x{x.shape[2]}. Pad or resize "
                "the input (the pix2pix 'stcgan' generator handles odd "
                "sizes natively).")
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ngf, d = self.ngf, self.depth

        links = []
        y = x
        for i in range(d):  # encoder: conv block then pool; link = conv out
            y = _DoubleConv(ngf * (2 ** i), self.use_selu,
                            dtype=self.dtype)(y, train)
            links.append(y)
            y = L.max_pool(y, 2)

        y = _DoubleConv(ngf * (2 ** d), self.use_selu,
                        dtype=self.dtype)(y, train)  # bottleneck

        for i in reversed(range(d)):  # decoder
            y = L.Upsample(ngf * (2 ** i), no_conv_t=self.no_conv_t,
                           use_bias=False, dtype=self.dtype)(y)
            y = _DoubleConv(ngf * (2 ** i), self.use_selu,
                            dtype=self.dtype)(
                jnp.concatenate([y, links[i]], axis=-1), train)
            # Inner skip levels carry dropout; the outermost does not
            # (reference unet.py:40-49: outer block drop_rate=0).
            if i > 0 and self.drop_rate > 0:
                # the reference's UNet never forwards use_selu to its
                # SkipConnectionLayer (src/models/unet.py:40-49), so the
                # executed dropout is always Dropout2d, even under SELU
                y = L.Dropout2d(self.drop_rate)(y, train)

        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        act = L.get_activation(self.activation)
        return act(y) if act is not None else y
