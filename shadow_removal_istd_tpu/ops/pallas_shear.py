"""Pallas TPU kernel: per-row fractional shear (the fast augmentation path).

The exact warp (ops/warp.py) is gather-bound: XLA lowers the bilinear
taps to ~0.6ms gathers per 256-crop. A rotation decomposes into three
shears — R(t) = ShearX(-tan(t/2)) . ShearY(sin t) . ShearX(-tan(t/2)) —
and a shear is a *per-row constant* fractional translation, which on TPU
is a dynamic slice plus a lerp: no gathers, pure VMEM-bandwidth work
vectorized along lanes.

Layout: images travel as (B, C, H, W) with W in the lane dimension; the
vertical shear runs as a horizontal shear on the transposed image.
Grid = (batch, row-blocks); per-row integer/fractional shifts arrive via
scalar prefetch so each row's dynamic slice start is known up front.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8  # rows per grid cell (sublane-friendly)
_LANE = 128    # Mosaic lane alignment for dynamic slices


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def should_interpret(devices=None) -> bool:
    """True when the Pallas kernel must run in interpreter mode.

    Mosaic kernels only compile for TPU. ``devices``: where the caller
    will place the computation (e.g. ``mesh.devices.flat``); when None,
    falls back to the process default backend. A jitted caller placing
    work on a CPU mesh under a TPU-default process must pass its
    devices — the in-kernel backend check cannot see jit placement.
    """
    if devices is not None:
        return any(d.platform != "tpu" for d in devices)
    return jax.default_backend() != "tpu"


def _shear_kernel(kint_ref, frac_ref, img_ref, out_ref):
    """ROW_BLOCK output rows: out[r] = lerp(img[r, k:k+W], k+1 row, f).

    Dynamic lane offsets must be 128-aligned on TPU, so each row loads a
    128-aligned window of out_w + 2*_LANE lanes and rotates it into
    place with a dynamic pltpu.roll (the residual k % 128 plus one more
    lane for the second bilinear tap).
    """
    b = pl.program_id(0)
    rb = pl.program_id(1)
    w_out = out_ref.shape[-1]
    w_win = _round_up(w_out + 2 * _LANE, _LANE)

    def body(i, _):
        row = rb * ROW_BLOCK + i
        k = kint_ref[b, row]
        f = frac_ref[b, row].astype(jnp.float32)
        k128 = pl.multiple_of((k // _LANE) * _LANE, _LANE)
        r = k - k128                       # residual in [0, 128)
        win = img_ref[0, :, i, pl.ds(k128, w_win)]       # (C, w_win)
        a = pltpu.roll(win, w_win - r, axis=1)
        bb = pltpu.roll(win, w_win - r - 1, axis=1)
        out_ref[0, :, i, :] = (a[:, :w_out] * (1.0 - f)
                               + bb[:, :w_out] * f)
        return 0

    jax.lax.fori_loop(0, ROW_BLOCK, body, 0)


def hshear(img_chw: jnp.ndarray, shifts: jnp.ndarray,
           out_w: int, pad: int, interpret: bool = False) -> jnp.ndarray:
    """Batched horizontal fractional shear.

    img_chw: (B, C, H, W) float32, UNPADDED. shifts: (B, H) float — the
    *source* x of output column 0 in image coordinates (values in
    [-pad, W + pad - out_w] reach into a zero border of ``pad`` columns,
    applied here in one fused pad together with the lane-alignment
    right-extension — one full-tensor copy per pass instead of two).
    Returns (B, C, H, out_w) where out[..., r, c] samples source column
    ``shifts[r] + c`` bilinearly.
    """
    bsz, c, h, w0 = img_chw.shape
    assert h % ROW_BLOCK == 0, f"H={h} must be a multiple of {ROW_BLOCK}"
    if not interpret and jax.default_backend() != "tpu":
        # Mosaic kernels only compile for TPU; run the interpreter on
        # CPU/GPU backends (slow but correct — tests, dry runs).
        interpret = True
    wp0 = w0 + 2 * pad                      # zero-bordered frame width
    src = shifts + pad                      # position in the padded frame
    kint = jnp.clip(jnp.floor(src), 0, wp0 - out_w - 1).astype(jnp.int32)
    frac = (src - jnp.floor(src)).astype(jnp.float32)

    # single pad: zero border + right-extension so every aligned window
    # (k128, k128 + w_win) stays in bounds at lane-aligned total width.
    w_win = _round_up(out_w + 2 * _LANE, _LANE)
    wp = _round_up(wp0 + w_win - out_w, _LANE)
    img_chw = jnp.pad(img_chw,
                      ((0, 0), (0, 0), (0, 0), (pad, wp - w0 - pad)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, h // ROW_BLOCK),
        in_specs=[
            pl.BlockSpec((1, c, ROW_BLOCK, wp),
                         lambda b, rb, kref, fref: (b, 0, rb, 0)),
        ],
        out_specs=pl.BlockSpec((1, c, ROW_BLOCK, out_w),
                               lambda b, rb, kref, fref: (b, 0, rb, 0)),
    )
    return pl.pallas_call(
        _shear_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, h, out_w), jnp.float32),
        interpret=interpret,
    )(kint, frac, img_chw)


def _scale_matrix(s: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B, n, n) center-anchored linear-interp resampling matrices for
    per-sample isotropic scale ``s`` (hat weights; zero border)."""
    i = jnp.arange(n, dtype=jnp.float32)
    center = (n - 1) / 2.0
    src = (i[None, :] - center) / s[:, None] + center      # (B, n)
    j = jnp.arange(n, dtype=jnp.float32)
    return jnp.clip(1.0 - jnp.abs(src[:, :, None] - j[None, None, :]),
                    0.0, 1.0)


def scale_center(img_bchw: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Per-sample center scale via two batched matmuls (MXU work)."""
    bsz, c, h, w = img_bchw.shape
    wr = _scale_matrix(s, h)
    wc = _scale_matrix(s, w)
    x = jnp.einsum("bri,bciw->bcrw", wr, img_bchw)
    return jnp.einsum("bwj,bcrj->bcrw", wc, x)


def shear_rotate_crop(img_nhwc: jnp.ndarray, angle_deg: jnp.ndarray,
                      row_off: jnp.ndarray, col_off: jnp.ndarray,
                      crop: int, max_angle_deg: float = 15.0,
                      interpret: bool = False) -> jnp.ndarray:
    """Rotation about the image center + crop via three shear passes.

    img_nhwc: (B, H, W, C) float32. angle_deg/row_off/col_off: (B,);
    ``max_angle_deg`` is the static bound on |angle_deg| used to size
    the zero padding (exceeding it silently clamps the resample window).
    Returns (B, crop, crop, C). Equivalent augmentation to the exact
    bilinear rotation (three 1-D resamples instead of one 2-D; the
    interpolation footprint differs slightly — this is the fast
    training-augmentation path, not the cv2-parity path).
    """
    bsz, h, w, c = img_nhwc.shape
    theta = jnp.deg2rad(angle_deg)
    a = -jnp.tan(theta / 2.0)           # x-shear coefficient
    b = jnp.sin(theta)                  # y-shear coefficient
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    # Worst-case shift magnitudes size the pads AND the intermediate
    # canvas: pass 1 pushes content up to a_max*h/2 columns off-frame
    # that pass 3 shears back into view, so the intermediate passes run
    # on a canvas expanded by ``margin`` on both sides.
    t_max = math.radians(min(abs(max_angle_deg), 89.0))
    a_max = math.tan(t_max / 2.0)
    b_max = math.sin(t_max)
    # margin is a multiple of 4 so the expanded width keeps the
    # transposed pass-2 row count a multiple of ROW_BLOCK
    margin = _round_up(math.ceil(a_max * h / 2.0) + 2, 4)
    wx = w + 2 * margin                     # expanded canvas width
    pad1 = 2 * margin
    pad2 = math.ceil(b_max * wx / 2.0) + 4
    pad3 = 4

    x = jnp.transpose(img_nhwc, (0, 3, 1, 2))  # (B, C, H, W)

    # pass 1: x-shear onto the expanded canvas. Output column c holds
    # true x = c - margin; source x of out col 0 in row r is
    # s1(r) - margin with s1 = a * (r - cy).
    rows = jnp.arange(h, dtype=jnp.float32)
    s1 = a[:, None] * (rows[None, :] - cy) - margin   # (B, H)
    x = hshear(x, s1, wx, pad1, interpret)

    # pass 2: y-shear as x-shear of the transpose; crop rows to the
    # requested window while we are in this orientation. Column index
    # c_exp on the expanded canvas has true x = c_exp - margin.
    x = jnp.transpose(x, (0, 1, 3, 2))               # (B, C, Wx, H)
    cols = jnp.arange(wx, dtype=jnp.float32) - margin
    s2 = (b[:, None] * (cols[None, :] - cx)
          + row_off[:, None].astype(jnp.float32))     # (B, Wx)
    x = hshear(x, s2, crop, pad2, interpret)

    # pass 3: final x-shear + column crop off the expanded canvas
    # (source position = true x + margin).
    x = jnp.transpose(x, (0, 1, 3, 2))               # (B, C, crop, Wx)
    rows_c = jnp.arange(crop, dtype=jnp.float32)
    abs_rows = rows_c[None, :] + row_off[:, None].astype(jnp.float32)
    s3 = (a[:, None] * (abs_rows - cy)
          + col_off[:, None].astype(jnp.float32) + margin)  # (B, crop)
    x = hshear(x, s3, crop, pad3, interpret)

    return jnp.transpose(x, (0, 2, 3, 1))            # (B, crop, crop, C)


def fused_augment_shear(stacked_u8: jnp.ndarray, params: dict,
                        crop: int, max_angle_deg: float = 15.0,
                        interpret: bool = False) -> jnp.ndarray:
    """Full fast-path augmentation: scale -> rotate -> flip -> crop ->
    [-1,1] normalize, same op order as the reference's transform chain
    (src/transform.py wiring at src/cgan.py:105-110).

    stacked_u8: (B, H, W, C) uint8 (channel-concatenated streams; any
    real dtype in [0, 255] works). params: output of
    ops.augment.sample_augment_params. Returns (B, crop, crop, C)
    float32 in [-1, 1].
    """
    bsz, h, w, c = stacked_u8.shape
    x = jnp.transpose(stacked_u8, (0, 3, 1, 2)).astype(jnp.float32)
    x = scale_center(x, params["scale"].astype(jnp.float32))
    x = jnp.transpose(x, (0, 2, 3, 1))               # back to NHWC

    # flip before crop: crop(flip(J), ro, co) == flip_cols(crop(J, ro,
    # W - crop - co))
    flip = params["flip"]
    co = jnp.where(flip, w - crop - params["col_off"], params["col_off"])
    out = shear_rotate_crop(x, params["angle"], params["row_off"], co,
                            crop, max_angle_deg=max_angle_deg,
                            interpret=interpret)
    out = jnp.where(flip[:, None, None, None], out[:, :, ::-1, :], out)
    return out * (2.0 / 255.0) - 1.0
