"""BEGAN autoencoder discriminator.

Architecture parity with reference src/models/began.py: 3x3 conv + norm
stem; (conv3x3 + norm + maxpool2) encoder; two-conv bottleneck; decoder
of (conv3x3 + norm + nearest-up) blocks where each non-final stage
concatenates a nearest-interpolated copy of the bottleneck at matching
scale; 3x3 out conv with Tanh (or Sigmoid). Used with the engine's
k-balance update (reference src/cgan.py:290-297, 352-360).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from shadow_removal_istd_tpu.models import layers as L


class BEGAN(nn.Module):
    in_channels: int | None = None
    out_channels: int | None = None  # None -> same as input (reference:78-79)
    ndf: int = 64
    n_layers: int = 3
    use_selu: bool = False
    use_sigmoid: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ndf = self.ndf
        y = L.Conv(ndf, (3, 3), padding=1, use_bias=True,
                   dtype=self.dtype)(x)
        y = L.ActNorm(self.use_selu)(y, train)

        for n in range(1, self.n_layers):  # encoder
            y = L.Conv(ndf * n, (3, 3), padding=1, use_bias=True,
                       dtype=self.dtype)(y)
            y = L.ActNorm(self.use_selu, dtype=self.dtype)(y, train)
            y = L.max_pool(y, 2)

        y = L.Conv(ndf, (3, 3), padding=1, use_bias=True,
               dtype=self.dtype)(y)  # bottleneck
        bottleneck = L.Conv(ndf, (3, 3), padding=1, use_bias=True,
                        dtype=self.dtype)(y)

        num_decoders = self.n_layers - 1
        y = bottleneck
        for i in range(num_decoders):
            # deconv block: conv3x3 -> norm -> nearest x2
            y = L.Conv(ndf, (3, 3), padding=1, use_bias=True,
                       dtype=self.dtype)(y)
            y = L.ActNorm(self.use_selu, dtype=self.dtype)(y, train)
            y = L.upsample_nearest(y, 2)
            if i < num_decoders - 1:
                # multi-scale skip: concat bottleneck upsampled to match
                skip = L.upsample_nearest(bottleneck, 2 ** (i + 1))
                y = jnp.concatenate([skip, y], axis=-1)

        out_ch = self.out_channels
        if out_ch is None:
            out_ch = x.shape[-1] if self.in_channels is None \
                else self.in_channels
        y = L.Conv(out_ch, (3, 3), padding=1, use_bias=True,
                   dtype=self.dtype)(y)
        return nn.sigmoid(y) if self.use_sigmoid else jnp.tanh(y)
