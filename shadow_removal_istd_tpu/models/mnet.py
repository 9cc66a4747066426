"""M-Net generator (SID, Le & Samaras ICCV'19) — the reference's default G.

Architecture parity with reference src/models/mnet.py: a 4x4-stride-2
reflect-conv stem, depth-4 encoder of (LeakyReLU -> 4x4s2 reflect conv ->
BN) blocks with channels capped at 8*ngf, decoder of (LeakyReLU ->
2x upsample -> BN) blocks whose outputs concatenate the *input* of the
matching encoder block, and a final upsample back to input resolution
with the output activation. Skip links carry the encoder blocks'
post-LeakyReLU activations (mnet.py:96 returns ``(model(x), x)`` where
the inplace LeakyReLU heading ``model`` has already mutated ``x``).
"""

from __future__ import annotations

from typing import Any

from flax import linen as nn

from shadow_removal_istd_tpu.models import layers as L
import jax.numpy as jnp


class _Down(nn.Module):
    """LeakyReLU -> 4x4s2 reflect conv -> BN (reference mnet._conv_block).

    The link carries the POST-LeakyReLU activation: the reference's
    ``_conv_block.forward`` returns ``(model(x), x)``, but ``model``
    opens with ``nn.LeakyReLU(inplace=True)`` which mutates ``x``'s
    storage before the link is consumed (mnet.py:86-99) — so the
    executed semantics concatenate ``leaky_relu(x)``, not ``x``.
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        a = nn.leaky_relu(x, negative_slope=0.2)
        y = L.ConvReflect(self.features, (4, 4), (2, 2), padding=1,
                          use_bias=False, dtype=self.dtype)(a)
        y = L.BatchNorm(dtype=self.dtype)(y, train)
        return y, a


class _Up(nn.Module):
    """LeakyReLU -> upsample -> BN, concat link (reference mnet._up_block)."""

    features: int
    no_conv_t: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, link, train: bool, split: bool = False):
        """``split=True`` (eval only): ``x`` may be a tuple of channel
        parts standing for their concatenation, and the return is the
        tuple ``(y, link)`` instead of ``concat([y, link])`` — the skip
        tensor is never materialized. Exact because LeakyReLU is
        elementwise and the upsample conv is linear in input channels
        (Upsample sums per-part phase convs with kernel slices)."""
        parts = x if isinstance(x, tuple) else (x,)
        ys = tuple(nn.leaky_relu(p, negative_slope=0.2) for p in parts)
        y = ys if len(ys) > 1 else ys[0]
        up = L.Upsample(self.features, no_conv_t=self.no_conv_t,
                        use_bias=False, dtype=self.dtype)
        bn = L.BatchNorm(dtype=self.dtype)
        if (not train and self.no_conv_t
                and ys[0].shape[1] * ys[0].shape[2] >= 4500):
            # eval fast path: BN affine on the phase channels BEFORE
            # depth-to-space — bit-identical (per-channel affine
            # commutes with the rearrangement), keeps the f32 affine in
            # the conv epilogue, and the d2s copy runs in bf16 (see
            # BatchNorm docstring). Gated on the static spatial size:
            # measured +13.5% stacked inference at 480x640 (385->437
            # img/s, where the f32 d2s transposes were 7.5% of device
            # time) but -3.5% at 256x256 (XLA's small-spatial fusion
            # choices are already better) — so only large layers take
            # this path. The area gate (4500 elements) separates the
            # full-res decoder's 60x80/120x160 layers (4800/19200, both
            # measured wins) from the 256x256 pipeline's largest 64x64
            # (4096, measured loss).
            y4, d2s = up(y, defer_d2s=True)
            y = bn(y4, False, d2s=d2s, tile=4)
        else:
            y = bn(up(y), train)
        if split:
            return y, link
        return jnp.concatenate([y, link], axis=-1)


class MNet(nn.Module):
    """Depth-4 encoder-decoder; output at input resolution."""

    out_channels: int
    in_channels: int | None = None  # kept for API parity; inferred by flax
    ngf: int = 64
    drop_rate: float = 0.0
    no_conv_t: bool = True
    use_selu: bool = False  # accepted for registry parity (unused, as in ref)
    activation: str | None = "tanh"
    depth: int = 4
    dtype: Any = None  # bf16 mixed-precision compute when set
    # Eval-only: carry decoder skip concats as (y, link) tuples and let
    # each consumer conv sum per-part kernel-slice convs instead of
    # reading a materialized concat (see _Up.__call__ / L.Upsample).
    split_skip: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # stem + depth strided halvings, each undone by a 2x upsample:
        # any indivisible dim desyncs a skip concat deep in the net
        # with a cryptic shape error — fail early with the real rule
        div = 2 ** (self.depth + 1)
        if x.shape[1] % div or x.shape[2] % div:
            raise ValueError(
                f"MNet(depth={self.depth}) needs H and W divisible by "
                f"{div}; got {x.shape[1]}x{x.shape[2]}. Pad or resize "
                "the input (ISTD's 480x640 divides; the pix2pix "
                "'stcgan' generator handles odd sizes natively).")
        if self.dtype is not None:
            x = x.astype(self.dtype)
        ngf, d = self.ngf, self.depth
        # Encoder/decoder channel plan (reference mnet.py:45-65):
        # down block i maps 2^min(i,3)*ngf -> 2^min(i+1,3)*ngf.
        down_feats = [(2 ** min(i + 1, 3)) * ngf for i in range(d)]
        up_feats = [(2 ** min(i, 3)) * ngf for i in range(d)]
        # decoder input channels: innermost gets down_feats[-1]; others get
        # 2 * down_feats[i] (upsampled concat from below).

        x = L.ConvReflect(ngf, (4, 4), (2, 2), padding=1,
                          use_bias=False, dtype=self.dtype)(x)

        links = []
        y = x
        for i in range(d):
            y, link = _Down(down_feats[i], dtype=self.dtype)(y, train)
            links.append(link)

        split = self.split_skip and not train and self.no_conv_t
        for i in reversed(range(d)):
            y = _Up(up_feats[i], no_conv_t=self.no_conv_t,
                    dtype=self.dtype)(y, links[i], train, split=split)
            # Dropout on every skip level except the outermost
            # (reference mnet.py:59-65: outer block drop_rate=0).
            # Identity at eval, so the split (eval-only) path skips it.
            if i > 0 and self.drop_rate > 0 and not split:
                y = L.Dropout2d(self.drop_rate)(y, train)

        y = L.Upsample(self.out_channels, no_conv_t=self.no_conv_t,
                       use_bias=False, dtype=self.dtype)(y)
        act = L.get_activation(self.activation)
        return act(y) if act is not None else y
