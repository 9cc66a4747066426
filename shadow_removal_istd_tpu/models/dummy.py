"""Dummy 1x1-conv discriminator.

Stand-in D for pure supervised ablations: selecting it zeroes the
adversarial loss weights in the engine (reference src/models/dummy.py and
src/cgan.py:160-162).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn


class DummyNet(nn.Module):
    out_channels: int = 1
    in_channels: int | None = None
    ngf: int = 64
    ndf: int = 64
    drop_rate: float = 0.0
    no_conv_t: bool = True
    use_selu: bool = False
    use_sigmoid: bool = False
    activation: str | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       dtype=self.dtype)(x)
