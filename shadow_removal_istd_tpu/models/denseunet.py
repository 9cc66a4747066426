"""DenseUNet generator — U-Net of DenseNet blocks.

Architecture parity with reference src/models/denseunet.py: depth-5,
growth_rate = ngf//2, 2 composite layers per dense block; 1x1 in/out
convs; transition-down = BN -> 1x1 conv -> avgpool2; transition-up =
ConvTranspose(2,2) or nearest-upsample + 3x3 reflect conv; each decoder
level concatenates the encoder dense-block output. ngf=48 default.

Note: the reference's DenseUNet asserts its ``activation`` argument is an
nn.Module, so the string the CLI passes crashes it (denseunet.py:63-64) —
the string form works here; documented as a fixed reference quirk.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from shadow_removal_istd_tpu.models import layers as L


class _DenseBlock(nn.Module):
    """Iterative concat growth (reference denseunet._dense_block)."""

    num_layers: int
    growth_rate: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(self.num_layers):
            y = x
            # composite: BN -> LeakyReLU -> 3x3 reflect conv
            x = L.BatchNorm(dtype=self.dtype)(x, train)
            x = nn.leaky_relu(x, negative_slope=0.2)
            x = L.ConvReflect(self.growth_rate, (3, 3), padding=1,
                              use_bias=False, dtype=self.dtype)(x)
            x = jnp.concatenate([x, y], axis=-1)
        return x


class _TransDown(nn.Module):
    """BN -> 1x1 conv -> avgpool2 (reference denseunet._trans_down)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = L.BatchNorm(dtype=self.dtype)(x, train)
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        return L.avg_pool(x, 2)


class _TransUp(nn.Module):
    """ConvTranspose(2,2) or nearest + 3x3 reflect conv."""

    features: int
    no_conv_t: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.no_conv_t:
            x = L.upsample_nearest(x, 2)
            return L.ConvReflect(self.features, (3, 3), padding=1,
                                 use_bias=False, dtype=self.dtype)(x)
        return nn.ConvTranspose(self.features, (2, 2), (2, 2),
                                padding="VALID", use_bias=False,
                                dtype=self.dtype)(x)


class DenseUNet(nn.Module):
    out_channels: int
    in_channels: int | None = None
    ngf: int = 48
    drop_rate: float = 0.0
    no_conv_t: bool = False
    use_selu: bool = False  # accepted for registry parity (unused, as in ref)
    activation: str | None = "tanh"
    depth: int = 5
    n_composite: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # depth avgpool halvings, each undone by a 2x transition-up
        div = 2 ** self.depth
        if x.shape[1] % div or x.shape[2] % div:
            raise ValueError(
                f"DenseUNet(depth={self.depth}) needs H and W divisible "
                f"by {div}; got {x.shape[1]}x{x.shape[2]}. Pad or resize "
                "the input (the pix2pix 'stcgan' generator handles odd "
                "sizes natively).")
        ngf = self.ngf
        growth = ngf // self.n_composite  # reference denseunet.py:34-36
        nlayers = self.n_composite

        x = nn.Conv(ngf, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)  # in_conv

        links = []
        y = x
        for _ in range(self.depth):  # encoder
            link = _DenseBlock(nlayers, growth, dtype=self.dtype)(y, train)   # ngf -> 2ngf
            links.append(link)
            y = _TransDown(ngf, dtype=self.dtype)(link, train)                # 2ngf -> ngf

        # bottleneck: 3*n_composite dense layers, ngf -> 4ngf
        y = _DenseBlock(3 * nlayers, growth, dtype=self.dtype)(y, train)

        for i in reversed(range(self.depth)):  # decoder
            # trans-up: 4ngf -> ngf; concat 2ngf link -> 3ngf; dense -> 4ngf
            y = _TransUp(ngf, no_conv_t=self.no_conv_t,
                         dtype=self.dtype)(y)
            y = _DenseBlock(nlayers, growth, dtype=self.dtype)(
                jnp.concatenate([y, links[i]], axis=-1), train)
            # reference denseunet.py:49-55: dropout except outermost level
            if i > 0 and self.drop_rate > 0:
                y = L.Dropout2d(self.drop_rate)(y, train)

        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)  # out_conv
        act = L.get_activation(self.activation)
        return act(y) if act is not None else y
