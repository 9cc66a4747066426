"""PatchGAN discriminator — the reference's default D.

Architecture parity with reference src/models/patchgan.py: 4x4s2 stem
conv (zero pad, bias) + LeakyReLU; n_layers-1 doubling 4x4s2 reflect
conv + (LeakyReLU+BN | SELU) blocks; a 3x3 reflect conv channel-doubling
tail with act/norm; and a final 3x3 reflect conv to a 1-channel logit
map (designed for a with-logits loss; optional sigmoid).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from shadow_removal_istd_tpu.models import layers as L


class PatchGAN(nn.Module):
    in_channels: int | None = None
    out_channels: int | None = None  # registry parity; output is 1 channel
    ndf: int = 64
    n_layers: int = 3
    use_selu: bool = False
    use_sigmoid: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        y = L.Conv(self.ndf, (4, 4), (2, 2), padding=1, use_bias=True,
                   dtype=self.dtype)(x)
        y = nn.leaky_relu(y, negative_slope=0.2)

        prev = self.ndf
        for n in range(1, self.n_layers):
            # channels double up to n<4, then stay (reference patchgan.py:38-47)
            features = prev * 2 if n < 4 else prev
            y = L.ConvReflect(features, (4, 4), (2, 2), padding=1,
                              use_bias=False, dtype=self.dtype)(y)
            y = L.ActNorm(self.use_selu, dtype=self.dtype)(y, train)
            prev = features

        tail = prev * 2 if self.n_layers < 4 else prev
        y = L.ConvReflect(tail, (3, 3), (1, 1), padding=1, use_bias=False,
                          dtype=self.dtype)(y)
        y = L.ActNorm(self.use_selu, dtype=self.dtype)(y, train)

        y = L.ConvReflect(1, (3, 3), (1, 1), padding=1, use_bias=False,
                          dtype=self.dtype)(y)
        if self.use_sigmoid:
            y = nn.sigmoid(y)
        return y
