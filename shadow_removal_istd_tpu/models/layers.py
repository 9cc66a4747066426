"""Shared building blocks for the generator/discriminator zoo.

Flax.linen modules in NHWC layout (TPU-native; the reference is NCHW
torch). The blocks mirror the reference's layer factory semantics
(reference: src/models/opt_layers.py):

- ``act_norm``      — SELU *or* LeakyReLU(0.2) + BatchNorm
                      (opt_layers.get_norm:21-26)
- ``Upsample``      — nearest-x2 + 3x3 reflect conv (anti-checkerboard)
                      *or* ConvTranspose(4,2,1) (opt_layers.get_upsample:39-56)
- ``get_activation``— sigmoid / tanh / htanh / none (opt_layers.get_activation)
- ``Dropout2d`` / ``AlphaDropout`` (opt_layers.get_dropout:29-36)

BatchNorm matches torch defaults: eps 1e-5, running-stat momentum 0.1
(flax ``momentum=0.9``), batch statistics in train mode. Under GSPMD data
parallelism the batch statistics are computed over the *global* batch
(XLA inserts the cross-replica reduction), which is strictly stronger
than the reference's per-replica DataParallel BN.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def dcgan_kernel_init(stddev: float = 0.02):
    """DCGAN N(0, 0.02) conv kernel init (reference: src/networks.py:19-30,
    applied only by the old tree, STCGAN/stcgan.py:415-433)."""
    return nn.initializers.normal(stddev=stddev)


def apply_dcgan_init(key, params, bn_scale_mean: float = 1.0,
                     stddev: float = 0.02):
    """Re-initialize a param tree DCGAN-style.

    Conv/ConvTranspose kernels ~ N(0, 0.02); biases 0; BatchNorm scales
    ~ N(bn_scale_mean, 0.02). The reference's ``weights_init``
    (src/networks.py:19-30) matches 'BatchNorm' in the Conv branch and
    draws the BN *scale* from N(0, 0.02) — pass ``bn_scale_mean=0.0``
    to reproduce that behaviour bit-for-bit; the default 1.0 is the
    standard DCGAN recipe.
    """
    import jax as _jax

    leaves_with_paths = _jax.tree_util.tree_flatten_with_path(params)[0]
    keys = _jax.random.split(key, len(leaves_with_paths))

    def init_leaf(path, leaf, k):
        name = str(path[-1])
        if "bias" in name:
            return jnp.zeros_like(leaf)
        if "scale" in name:  # BatchNorm scale
            return (bn_scale_mean
                    + stddev * _jax.random.normal(k, leaf.shape,
                                                  leaf.dtype))
        if "kernel" in name:
            return stddev * _jax.random.normal(k, leaf.shape, leaf.dtype)
        return leaf

    new_leaves = [init_leaf(p, l, k)
                  for (p, l), k in zip(leaves_with_paths, keys)]
    treedef = _jax.tree_util.tree_structure(params)
    return _jax.tree_util.tree_unflatten(treedef, new_leaves)


class ConvReflect(nn.Module):
    """Conv2D with reflection padding (torch padding_mode='reflect')."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = None  # computation dtype (params stay float32)

    @nn.compact
    def __call__(self, x):
        p = self.padding
        if p > 0:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        return nn.Conv(self.features, self.kernel_size, self.strides,
                       padding="VALID", use_bias=self.use_bias,
                       kernel_init=self.kernel_init, dtype=self.dtype)(x)


class Conv(nn.Module):
    """Conv2D with zero padding (torch default padding_mode)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.padding
        return nn.Conv(self.features, self.kernel_size, self.strides,
                       padding=((p, p), (p, p)), use_bias=self.use_bias,
                       kernel_init=self.kernel_init, dtype=self.dtype)(x)


# --------------------------------------------------------------------------
# Train-step BN experiment knob (benchmarks/ab_bn_stats.py): batch
# statistics estimated from every STRIDE-th image row instead of all of
# them. The r3 trace puts BatchNorm stat/affine passes at ~28% of
# train-step device time; row subsampling was the one lever that could
# remove reduce bytes (the reduce's data dependency forbids fusing it
# with the normalize). MEASURED ON HARDWARE AND REJECTED (r5): stride 2
# = -10.7%, stride 4 = -6.4% on the fused epoch (332 -> 296.5 / 310.7
# img/s) — XLA materializes the strided row slice as its own copy pass,
# ADDING traffic instead of removing it. The knob stays as the measured
# record (stride=1, the default, is bit-exact reference semantics and
# compiles to the identical graph); do not re-attempt without first
# solving the slice materialization.
# --------------------------------------------------------------------------
BN_STAT_STRIDE = 1


def set_bn_stat_stride(stride: int) -> None:
    global BN_STAT_STRIDE
    BN_STAT_STRIDE = int(stride)


class BatchNorm(nn.Module):
    """BatchNorm matching torch nn.BatchNorm2d semantics exactly.

    eps 1e-5; running stats updated as ``0.9*old + 0.1*new`` (torch
    momentum 0.1) with the **unbiased** batch variance (n/(n-1)) — the
    one place flax's nn.BatchNorm deviates from torch (flax stores the
    biased variance), which matters for checkpoint interchange with the
    reference and for eval-mode parity after training. Normalization in
    train mode uses the biased batch variance, as torch does.

    Statistics accumulate in ``promote_types(input, float32)`` — under
    bf16 compute the input is upcast for the reduction (standard
    mixed-precision practice) and float64 inputs keep float64 (the x64
    numerical-parity harnesses need the headroom); the output returns
    in the surrounding compute dtype.
    Under GSPMD data parallelism the reductions below run over the
    *global* batch (XLA partitions them), which is strictly stronger
    than the reference's per-replica DataParallel BN.
    """

    dtype: Any = None
    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: weight of the NEW stats

    @nn.compact
    def __call__(self, x, train: bool, d2s=None, tile: int = 1):
        """``d2s``/``tile`` (eval only): ``x`` is a subpixel PHASE
        tensor with ``tile * C`` channels whose channel ``c + k*C``
        maps to output channel ``c``; the eval affine is applied with
        tiled parameters and ``d2s`` rearranges afterwards. Per-channel
        affine commutes with the spatial rearrangement, so this is
        bit-identical to affine-after-d2s — but the f32 affine stays
        fused in the conv epilogue and the d2s layout copy moves bf16
        instead of f32 (measured +7% stacked inference at 480x640)."""
        in_dtype = x.dtype
        x32 = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        c = x.shape[-1] // tile
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            assert d2s is None and tile == 1, \
                "phase-tiled affine is an eval-only fast path"
            xs = x32
            if (BN_STAT_STRIDE > 1 and x32.ndim == 4
                    and x32.shape[1] >= 8 * BN_STAT_STRIDE):
                # subsampled-stats mode (opt-in, see module docstring):
                # estimate mean/var from every STRIDE-th row — the
                # reduce pass reads 1/STRIDE of the bytes
                xs = x32[:, ::BN_STAT_STRIDE]
            axes = tuple(range(xs.ndim - 1))
            mean = jnp.mean(xs, axes)
            mean2 = jnp.mean(jnp.square(xs), axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)  # biased
            if not self.is_initializing():
                n = xs.size / c
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
            if tile > 1:
                mean = jnp.tile(mean, tile)
                var = jnp.tile(var, tile)
                scale = jnp.tile(scale, tile)
                bias = jnp.tile(bias, tile)

        y = (x32 - mean) * (scale * jax.lax.rsqrt(var + self.epsilon)) + bias
        out_dtype = self.dtype or in_dtype
        y = y.astype(out_dtype)
        return d2s(y) if d2s is not None else y


class ActNorm(nn.Module):
    """SELU, or LeakyReLU(0.2) followed by BatchNorm.

    Reference: opt_layers.get_norm — note the activation comes *before*
    the normalization there, preserved here.
    """

    use_selu: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.use_selu:
            return jax.nn.selu(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return BatchNorm(dtype=self.dtype)(x, train)


def subpixel_phase_kernel(w):
    """3x3 kernel -> the (2,2,ci,4co) phase kernel of the subpixel
    decomposition (see ``_subpixel_nn_conv``); shared with the int8
    serving path (models/quant.py), which quantizes this transformed
    kernel."""
    # row-parity combine: even rows tap (x[i-1], x[i]) with (w0, w1+w2);
    # odd rows tap (x[i], x[i+1]) with (w0+w1, w2)
    we_r = jnp.stack([w[0], w[1] + w[2]], axis=0)          # (2,3,ci,co)
    wo_r = jnp.stack([w[0] + w[1], w[2]], axis=0)

    def _col(wr):
        return (jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], axis=1),
                jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], axis=1))

    wee, weo = _col(we_r)
    woe, woo = _col(wo_r)
    return jnp.concatenate([wee, weo, woe, woo], axis=-1)  # (2,2,ci,4co)


def subpixel_depth_to_space(y, h, wd, cout):
    """(n, h+1, w+1, 4co) phase-conv output -> (n, 2h, 2w, co)."""
    n = y.shape[0]
    yee = y[:, :h, :wd, 0 * cout:1 * cout]
    yeo = y[:, :h, 1:, 1 * cout:2 * cout]
    yoe = y[:, 1:, :wd, 2 * cout:3 * cout]
    yoo = y[:, 1:, 1:, 3 * cout:4 * cout]
    rows0 = jnp.stack([yee, yeo], axis=3)                  # (n,h,w,2,co)
    rows1 = jnp.stack([yoe, yoo], axis=3)
    out = jnp.stack([rows0, rows1], axis=2)                # (n,h,2,w,2,co)
    return out.reshape(n, 2 * h, 2 * wd, cout)


def _subpixel_nn_conv_phase(x, w, dtype=None):
    """The phase-conv half of :func:`_subpixel_nn_conv`: returns the
    (n, h+1, w+1, 4co) phase tensor plus the matching depth-to-space
    closure, so a caller can slip a (per-channel) epilogue between the
    conv and the d2s rearrangement — see ``BatchNorm.__call__(d2s=...)``
    for why that ordering is a measured win at full resolution."""
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    compute_dtype = dtype or x.dtype
    kernel = subpixel_phase_kernel(w.astype(compute_dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp.astype(compute_dtype), kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (n, h+1, w+1, 4co)
    return y, lambda t: subpixel_depth_to_space(t, h, wd, cout)


def _subpixel_nn_conv(x, w, dtype=None):
    """nearest-2x upsample + 3x3 reflect-pad conv, computed WITHOUT
    materializing the upsampled tensor.

    On the 2x-NN-upsampled canvas, every 3x3 window only touches a 2x2
    neighbourhood of ORIGINAL pixels (with tap multiplicities set by the
    output's row/column parity), so the op decomposes exactly into ONE
    2x2 conv producing 4*Cout phase channels on the low-res input,
    followed by depth-to-space. 2.25x fewer MXU FLOPs and no 4x
    activation blow-up; bit-equivalent up to fp re-association. The
    reflect-pad of the upsampled canvas (up[-1]=up[1]=x[0]) reduces to
    an EDGE pad of the low-res input.
    """
    y, d2s = _subpixel_nn_conv_phase(x, w, dtype)
    return d2s(y)


class Upsample(nn.Module):
    """2x upsampling: nearest+3x3 reflect conv (no_conv_t=True, the
    anti-checkerboard choice, reference src/main.py:282-288) or
    ConvTranspose(4, stride 2, pad 1).

    The nearest+conv path runs as a subpixel-decomposed conv by default
    (see ``_subpixel_nn_conv``) — same math, same parameters at the same
    tree paths, 2.25x fewer FLOPs; ``subpixel=False`` keeps the naive
    materialized form.
    """

    features: int
    no_conv_t: bool = True
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Any = None
    subpixel: bool = True

    @nn.compact
    def __call__(self, x, defer_d2s: bool = False):
        """``defer_d2s=True`` (subpixel path only) returns
        ``(phase_tensor, d2s_closure)`` instead of the upsampled output,
        letting the caller apply a per-channel epilogue on the 4co phase
        channels while they are still the conv's direct output (so XLA
        fuses it into the conv epilogue) and run the d2s layout copy in
        the narrow dtype afterwards."""
        parts = x if isinstance(x, (tuple, list)) else None
        if parts is not None:
            x = (jnp.concatenate(parts, axis=-1)
                 if not (self.no_conv_t and self.subpixel) else parts[0])
        if self.no_conv_t:
            conv = ConvReflect(self.features, (3, 3), (1, 1), padding=1,
                               use_bias=self.use_bias,
                               kernel_init=self.kernel_init,
                               dtype=self.dtype)
            if not self.subpixel:
                assert not defer_d2s
                return conv(upsample_nearest(x, 2))
            # Materialize the conv's params at their usual tree path by
            # tracing it on a tiny dummy; XLA dead-code-eliminates the
            # unused call, and checkpoints/bridge layouts stay stable.
            cin = (x.shape[-1] if parts is None
                   else sum(p.shape[-1] for p in parts))
            _ = conv(jnp.zeros((1, 2, 2, cin), x.dtype))
            w = conv.variables["params"]["Conv_0"]["kernel"]
            if parts is not None:
                # Split-concat form: conv is linear in input channels,
                # so conv(concat(parts), w) == sum(conv(p, w_slice)) —
                # the concatenated skip tensor is never materialized
                # (one HBM round trip saved per decoder layer). Params
                # stay a single full-width kernel at the usual path.
                off, y = 0, None
                for p in parts:
                    c = p.shape[-1]
                    yp, d2s = _subpixel_nn_conv_phase(
                        p, w[:, :, off:off + c], dtype=self.dtype)
                    y = yp if y is None else y + yp
                    off += c
            else:
                y, d2s = _subpixel_nn_conv_phase(x, w, dtype=self.dtype)
            if defer_d2s:
                assert not self.use_bias
                return y, d2s
            out = d2s(y)
            if self.use_bias:
                out = out + conv.variables["params"]["Conv_0"]["bias"]
            return out
        assert not defer_d2s
        # 'SAME' reproduces torch ConvTranspose2d(4, stride=2, padding=1)
        # geometry: out = 2*in with one row/col cropped from each side.
        return nn.ConvTranspose(self.features, (4, 4), (2, 2),
                                padding="SAME",
                                use_bias=self.use_bias,
                                kernel_init=self.kernel_init,
                                dtype=self.dtype)(x)


class Dropout2d(nn.Module):
    """Channel dropout (torch nn.Dropout2d): zeroes whole feature maps."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.Dropout(self.rate, broadcast_dims=(1, 2),
                          deterministic=not train)(x)


class AlphaDropout(nn.Module):
    """SELU-compatible alpha dropout (torch nn.AlphaDropout)."""

    rate: float
    alpha_prime: float = -1.7580993408473766  # -selu_alpha * selu_scale

    @nn.compact
    def __call__(self, x, train: bool):
        if not train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, x.shape)
        a = (keep + self.alpha_prime ** 2 * keep * (1 - keep)) ** -0.5
        b = -a * self.alpha_prime * (1 - keep)
        return a * jnp.where(mask, x, self.alpha_prime) + b


def make_dropout(use_selu: bool, rate: float):
    """Dropout factory (reference: opt_layers.get_dropout:29-36)."""
    if rate == 0:
        return None
    return AlphaDropout(rate) if use_selu else Dropout2d(rate)


def get_activation(key: str | None) -> Callable | None:
    """Output activation by key (reference: opt_layers.get_activation)."""
    if key is None or key == "none":
        return None
    if key == "sigmoid":
        return jax.nn.sigmoid
    if key == "tanh":
        return jnp.tanh
    if key == "htanh":
        return lambda x: jnp.clip(x, -1.0, 1.0)
    raise ValueError(f"unknown activation: {key}")


def max_pool(x, window: int = 2):
    """Max pool, stride == window (torch F.max_pool2d(x, 2))."""
    return nn.max_pool(x, (window, window), strides=(window, window))


def avg_pool(x, window: int = 2):
    """Average pool, stride == window (torch nn.AvgPool2d(2))."""
    return nn.avg_pool(x, (window, window), strides=(window, window))


def upsample_nearest(x, factor: int = 2):
    """Nearest-neighbour upsampling by an integer factor."""
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)
