"""Post-training int8 quantization for stacked MNet inference (serving).

TPU v5e's MXU runs s8 x s8 -> s32 matmuls at twice the bf16 rate, and
int8 activations quarter the HBM traffic of f32 — a serving-path
optimization with no counterpart in the reference (whose deployment
story is a pickled fp32 ``state_dict``, src/cgan.py:466-488).

Pipeline (all jit-friendly, inference/eval mode only):

1. :func:`fold_mnet` — fold eval-mode BatchNorm affines into the conv
   weights (conv -> BN becomes conv' + bias), producing a flat
   "folded" param dict. The folded f32 forward
   (:func:`mnet_apply_folded`) is numerically the eval-mode
   ``MNet.apply`` — tested to tight tolerance.
2. Calibration — :func:`mnet_apply_folded` with ``observe=True``
   additionally returns the max-|activation| at every conv input;
   :func:`calibrate_mnet` folds the running max over representative
   batches into per-tensor activation scales.
3. :func:`quantize_mnet` — symmetric int8: per-output-channel weight
   scales, per-tensor activation scales.
4. :func:`mnet_apply_folded` with ``qparams=`` — the quantized
   forward: activations are quantized at each conv input, convs run
   s8 x s8 -> s32 on the MXU, outputs dequantize into the surrounding
   bf16/f32 elementwise chain.

Only the MNet generator family (the reference's default G,
src/main.py:176) with the nearest-upsample decoder is supported; the
stacked G1+G2 pair quantizes via :func:`quantize_stacked`.

Measured on the current chip/XLA the int8 path does NOT outrun the
bf16 flagship at these channel widths (see README "int8 PTQ,
measured") — it is kept as an accuracy-tested option (4x smaller packs)
for hardware/widths where the trade flips.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.models.layers import (
    subpixel_depth_to_space,
    subpixel_phase_kernel,
)


def _bn_fold(kernel, bn_params, bn_stats, eps=1e-5):
    """conv(no bias) -> eval-BN  ==  conv(kernel * s) + b."""
    s = bn_params["scale"] * jax.lax.rsqrt(bn_stats["var"] + eps)
    b = bn_params["bias"] - bn_stats["mean"] * s
    return kernel * s[None, None, None, :], b


def fold_mnet(params: dict, batch_stats: dict, depth: int = 4,
              eps: float = 1e-5) -> dict:
    """Fold BatchNorm into conv weights -> flat folded param dict.

    Layout (all f32): ``stem`` (4,4,ci,ngf); ``down{i}`` kernel+bias;
    ``up{i}`` kernel+bias (i in decoder application order, innermost
    first); ``final`` kernel. Matches the MNet module tree produced by
    models/mnet.py (no_conv_t upsampling).
    """
    if "ConvReflect_0" not in params.get("Upsample_0", {}):
        raise ValueError(
            "int8 PTQ supports the MNet nearest-upsample decoder "
            "(no_conv_t/NN-upconv); this param tree has a ConvTranspose "
            "decoder — train with --NN-upconv or serve it in bf16")
    f = {"stem": params["ConvReflect_0"]["Conv_0"]["kernel"]}
    for i in range(depth):
        k = params[f"_Down_{i}"]["ConvReflect_0"]["Conv_0"]["kernel"]
        kf, b = _bn_fold(k, params[f"_Down_{i}"]["BatchNorm_0"],
                         batch_stats[f"_Down_{i}"]["BatchNorm_0"], eps)
        f[f"down{i}_w"], f[f"down{i}_b"] = kf, b
    for i in range(depth):
        k = params[f"_Up_{i}"]["Upsample_0"]["ConvReflect_0"]["Conv_0"][
            "kernel"]
        kf, b = _bn_fold(k, params[f"_Up_{i}"]["BatchNorm_0"],
                         batch_stats[f"_Up_{i}"]["BatchNorm_0"], eps)
        f[f"up{i}_w"], f[f"up{i}_b"] = kf, b
    f["final"] = params["Upsample_0"]["ConvReflect_0"]["Conv_0"]["kernel"]
    return f


def _wscale(w):
    """Per-output-channel symmetric weight scale (last axis)."""
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    return jnp.maximum(amax, 1e-12) / 127.0


def _quantize(x, scale):
    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def quantize_mnet(folded: dict, act_scales: dict, depth: int = 4) -> dict:
    """Folded f32 params + calibrated activation amaxes -> int8 pack.

    The decoder/final kernels are quantized AFTER the subpixel phase
    transform (layers._subpixel_nn_conv) so the quantization error is
    taken on the kernel that actually runs; phase channels of one
    output channel share that channel's dequant scale granularity
    (per-channel over the 4*Cout transformed axis).
    """
    q: dict[str, Any] = {}

    def pack(name, w):
        sw = _wscale(w)
        q[name + "_w"] = _quantize(w, sw)
        sx = jnp.maximum(act_scales[name], 1e-12) / 127.0
        q[name + "_s"] = (sx * sw).astype(jnp.float32)   # dequant scale
        q[name + "_sx"] = sx.astype(jnp.float32)         # input quant

    pack("stem", folded["stem"])
    for i in range(depth):
        pack(f"down{i}", folded[f"down{i}_w"])
        q[f"down{i}_b"] = folded[f"down{i}_b"]
        pack(f"up{i}", subpixel_phase_kernel(folded[f"up{i}_w"]))
        q[f"up{i}_b"] = folded[f"up{i}_b"]
    pack("final", subpixel_phase_kernel(folded["final"]))
    return q


def _conv_s2_reflect(x, w, qscale=None):
    """4x4 stride-2 conv with reflect pad 1; int8 path when qscale set.

    qscale = (sx, dequant_per_channel) -> quantize input, s8 conv with
    s32 accumulation, dequant. Otherwise f32/bf16 conv.
    """
    if qscale is not None:
        sx, s = qscale
        x = _quantize(x, sx)
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    if qscale is None:
        return jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        x, w, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s


def _subpixel_phase_conv(x, w_t, cout, qscale=None):
    """_subpixel_nn_conv's compute from the phase kernel (2,2,ci,4co).

    Shares its exact depth-to-space epilogue; int8 path quantizes the
    input and runs the 2x2 conv as s8 x s8 -> s32.
    """
    n, h, wd, _ = x.shape
    if qscale is not None:
        sx, s = qscale
        x = _quantize(x, sx)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    if qscale is None:
        y = jax.lax.conv_general_dilated(
            xp, w_t.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        y = jax.lax.conv_general_dilated(
            xp, w_t, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * s
    return subpixel_depth_to_space(y, h, wd, cout)


def _leaky(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


ENCODER_SITES = frozenset(
    ["stem"] + [f"down{i}" for i in range(8)])


def mnet_apply_folded(folded: dict, x, depth: int = 4,
                      activation: str = "tanh", observe: bool = False,
                      qparams: dict | None = None,
                      quant_sites: frozenset | None = None,
                      compute_dtype=jnp.float32):
    """Eval-mode MNet forward from folded (or quantized) params.

    - folded params, ``observe=False``  -> y          (f32 reference)
    - folded params, ``observe=True``   -> (y, amax)  (calibration)
    - ``qparams`` set                   -> y          (int8 convs)
    - ``qparams`` + ``quant_sites``     -> SELECTIVE int8: only the
      named sites run s8 convs; the rest run the folded weights in
      ``compute_dtype`` (pass ``folded`` too). The interesting split is
      :data:`ENCODER_SITES` — the wide stride-2 encoder convs are where
      the s8 MXU rate can win, while the bandwidth-bound subpixel
      decoder stays bf16 (the whole-net int8 A/B lost to bf16 on
      dequant traffic; see README "int8 PTQ, measured").

    Mirrors models/mnet.py's eval graph: stem conv; depth x
    (leaky -> 4x4s2 conv+bias); depth x (leaky -> subpixel up
    conv+bias -> concat post-leaky encoder link); final subpixel up
    conv; output activation. Reference architecture:
    /root/reference/src/models/mnet.py:37-110.
    """
    amax: dict[str, jnp.ndarray] = {}
    if quant_sites is not None and qparams is not None:
        assert folded is not None, \
            "selective int8 needs the folded f32 params for the " \
            "unquantized sites"

    def obs(name, t):
        if observe:
            amax[name] = jnp.max(jnp.abs(t)).astype(jnp.float32)

    def q(name):
        if qparams is None:
            return None
        if quant_sites is not None and name not in quant_sites:
            return None
        return qparams[name + "_sx"], qparams[name + "_s"]

    def w_enc(name):
        """Encoder-kernel source for one site (untransformed layout)."""
        if q(name) is not None:
            return qparams[name + "_w"]
        return folded[name if name == "stem" else name + "_w"]

    def w_up(name):
        """Decoder-kernel source (subpixel phase layout)."""
        if q(name) is not None:
            return qparams[name + "_w"]
        key = "final" if name == "final" else name + "_w"
        return subpixel_phase_kernel(folded[key])

    def bias(name):
        src = folded if (qparams is None or quant_sites is not None) \
            else qparams
        return src[name + "_b"]

    x = x.astype(compute_dtype)
    obs("stem", x)
    y = _conv_s2_reflect(x, w_enc("stem"), q("stem"))
    y = y.astype(compute_dtype)

    links = []
    for i in range(depth):
        a = _leaky(y)
        links.append(a)
        obs(f"down{i}", a)
        y = _conv_s2_reflect(a, w_enc(f"down{i}"), q(f"down{i}"))
        y = (y + bias(f"down{i}")).astype(compute_dtype)

    # flax names decoder blocks in creation order (innermost first):
    # _Up_{j} is the j-th APPLIED block and concatenates links[d-1-j]
    for j in range(depth):
        z = _leaky(y)
        obs(f"up{j}", z)
        cout = bias(f"up{j}").shape[0]
        u = _subpixel_phase_conv(z, w_up(f"up{j}"), cout, q(f"up{j}"))
        u = (u + bias(f"up{j}")).astype(compute_dtype)
        y = jnp.concatenate([u, links[depth - 1 - j]], axis=-1)

    obs("final", y)
    if q("final") is not None:
        cout = qparams["final_w"].shape[-1] // 4
    else:
        cout = folded["final"].shape[-1]
    y = _subpixel_phase_conv(y, w_up("final"), cout, q("final"))
    y = y.astype(jnp.float32)
    if activation == "tanh":
        y = jnp.tanh(y)
    elif activation == "sigmoid":
        y = jax.nn.sigmoid(y)
    elif activation == "htanh":
        y = jnp.clip(y, -1.0, 1.0)
    return (y, amax) if observe else y


def calibrate_mnet(folded: dict, batches, depth: int = 4,
                   activation: str = "tanh",
                   return_outputs: bool = False):
    """Run representative batches, return per-site activation amaxes
    (and, with ``return_outputs``, the forward outputs — the observe
    pass computes them anyway, so stacked calibration reuses them as
    G2 inputs instead of re-running G1)."""
    run = jax.jit(partial(mnet_apply_folded, depth=depth,
                          activation=activation, observe=True))
    scales: dict | None = None
    outputs = []
    for x in batches:
        y, amax = run(folded, x)
        outputs.append(y)
        scales = amax if scales is None else \
            jax.tree_util.tree_map(jnp.maximum, scales, amax)
    assert scales is not None, "need at least one calibration batch"
    return (scales, outputs) if return_outputs else scales


# ---------------------------------------------------------------------------
# Stacked G1+G2 pair


def fold_stacked(state, depth: int = 4):
    """TrainState -> (folded_g1, folded_g2)."""
    return (fold_mnet(state.g_params["g1"], state.batch_stats["g1"],
                      depth=depth),
            fold_mnet(state.g_params["g2"], state.batch_stats["g2"],
                      depth=depth))


def quantize_stacked(state, calib_batches, depth: int = 4,
                     activation: str = "tanh"):
    """PTQ the stacked pair; returns (q1, q2) int8 packs.

    ``calib_batches``: iterable of (N, H, W, 3) inputs in [-1, 1].
    G2's calibration inputs are G1's folded-f32 outputs concatenated to
    the image, exactly as served (engine/steps.py infer path).
    """
    f1, f2 = fold_stacked(state, depth=depth)
    batches = list(calib_batches)
    s1, m1 = calibrate_mnet(f1, batches, depth=depth,
                            activation=activation, return_outputs=True)
    g2_in = [jnp.concatenate([x, m], axis=-1)
             for x, m in zip(batches, m1)]
    s2 = calibrate_mnet(f2, g2_in, depth=depth, activation=activation)
    return quantize_mnet(f1, s1, depth=depth), \
        quantize_mnet(f2, s2, depth=depth)


def make_stacked_int8(q1: dict, q2: dict, depth: int = 4,
                      activation: str = "tanh",
                      compute_dtype=jnp.bfloat16):
    """(q1, q2) -> jittable ``fn(x) -> (matte, shadow_free)``."""

    def fn(x):
        m = mnet_apply_folded(None, x, depth=depth, activation=activation,
                              qparams=q1, compute_dtype=compute_dtype)
        y = mnet_apply_folded(None, jnp.concatenate(
            [x.astype(jnp.float32), m], axis=-1), depth=depth,
            activation=activation, qparams=q2,
            compute_dtype=compute_dtype)
        return m, y

    return fn
