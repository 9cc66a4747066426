"""Pix2pix U-Net generator and NLayer (70x70 PatchGAN) discriminator.

Architecture parity with reference src/models/stcgan_g.py (UnetGenerator,
num_downs=8, recursive UnetSkipConnectionBlock) and src/models/stcgan_d.py
(NLayerDiscriminator). All convs 4x4 zero-padded; BatchNorm blocks use
bias-free convs (torch ``use_bias = isinstance(norm_layer, InstanceNorm)``
evaluates False for the BatchNorm *class*, so convs adjacent to BN carry
no bias while the outermost up-conv and the stem/final D convs do).

Odd-size inputs: each skip level zero-pads H/W to even before its
down-conv and crops the result back so the concat aligns — this is what
lets the stacked model run at the ISTD native 480x640 (stcgan_g.py:124-132).
Under jit the shapes are static so the padding branch resolves at trace
time.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from shadow_removal_istd_tpu.models import layers as L


class Pix2PixUNet(nn.Module):
    """UnetGenerator: recursive U-Net, channel plan
    in -> ngf -> 2ngf -> 4ngf -> 8ngf -> [8ngf x (num_downs-5)] -> bottleneck.
    """

    out_channels: int
    in_channels: int | None = None
    ngf: int = 64
    num_downs: int = 8
    use_dropout: bool = False
    # registry-parity kwargs (ignored by the reference's UnetGenerator too)
    drop_rate: float = 0.0
    no_conv_t: bool = False
    use_selu: bool = False
    activation: str | None = "tanh"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ngf = self.ngf
        # inner channel count at each level, outermost first.
        inner = [ngf, ngf * 2, ngf * 4] + [ngf * 8] * (self.num_downs - 3)

        def block(x, level):
            outermost = level == 0
            innermost = level == self.num_downs - 1

            # pad odd spatial dims to even so down/up shapes align
            h, w = x.shape[1], x.shape[2]
            ph, pw = h % 2, w % 2
            y = x
            if ph or pw:
                y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))

            if not outermost:
                y = nn.leaky_relu(y, negative_slope=0.2)
            y = L.Conv(inner[level], (4, 4), (2, 2), padding=1,
                       use_bias=False, dtype=self.dtype)(y)
            if not outermost and not innermost:
                y = L.BatchNorm(dtype=self.dtype)(y, train)

            if not innermost:
                y = block(y, level + 1)

            up_features = self.out_channels if outermost else inner[level - 1]
            y = nn.relu(y)
            # 'SAME' == torch ConvTranspose2d(4, stride 2, padding 1)
            y = nn.ConvTranspose(up_features, (4, 4), (2, 2),
                                 padding="SAME",
                                 use_bias=outermost,
                                 dtype=self.dtype)(y)
            if outermost:
                return jnp.tanh(y)
            y = L.BatchNorm(dtype=self.dtype)(y, train)
            # dropout only on the ngf*8 middle blocks (reference
            # stcgan_g.py:36-40 passes use_dropout to those levels only)
            if self.use_dropout and 4 <= level <= self.num_downs - 2:
                y = nn.Dropout(0.5, deterministic=not train)(y)
            # Skip-concat semantics (reference stcgan_g.py:123-139): the
            # block's leading LeakyReLU(inplace=True) mutates x before
            # ``torch.cat([x, self.model(x)])`` reads it — UNLESS the
            # odd-size branch ran, where F.pad copies x first. So even
            # dims concat leaky_relu(x); odd dims concat the raw x.
            if ph or pw:
                y = y[:, :h, :w, :]
                return jnp.concatenate([x, y], axis=-1)
            return jnp.concatenate(
                [nn.leaky_relu(x, negative_slope=0.2), y], axis=-1)

        return block(x, 0)


class NLayerDiscriminator(nn.Module):
    """Classic 70x70 PatchGAN (reference src/models/stcgan_d.py)."""

    in_channels: int | None = None
    out_channels: int | None = None  # registry parity; output is 1 channel
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    use_selu: bool = False  # registry parity (reference ignores via kwargs)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = L.Conv(self.ndf, (4, 4), (2, 2), padding=1, use_bias=True,
                   dtype=self.dtype)(x)
        y = nn.leaky_relu(y, negative_slope=0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2 ** n, 8)
            y = L.Conv(self.ndf * nf_mult, (4, 4), (2, 2), padding=1,
                       use_bias=False, dtype=self.dtype)(y)
            y = L.BatchNorm(dtype=self.dtype)(y, train)
            y = nn.leaky_relu(y, negative_slope=0.2)

        nf_mult = min(2 ** self.n_layers, 8)
        y = L.Conv(self.ndf * nf_mult, (4, 4), (1, 1), padding=1,
                   use_bias=False, dtype=self.dtype)(y)
        y = L.BatchNorm(dtype=self.dtype)(y, train)
        y = nn.leaky_relu(y, negative_slope=0.2)

        y = L.Conv(1, (4, 4), (1, 1), padding=1, use_bias=True,
                   dtype=self.dtype)(y)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        return y
