"""Pallas fused MNet decoder-upsample kernel (eval path).

One kernel for the whole `_Up` eval chain at a decoder layer:

    LeakyReLU(0.2) -> 2x2 subpixel phase conv (MXU) -> BatchNorm eval
    affine (f32) -> bf16 convert -> depth-to-space

The XLA lowering of this chain runs LeakyReLU as a separate
HBM-bandwidth-bound pass (26% of flagship device time per the README
profile), materializes the phase tensor, and pays a layout copy for the
depth-to-space. Here every step happens in VMEM between one read of the
activation block and one write of the upsampled output:

- activations stream in once as (R+2)-row blocks (two single-row halo
  BlockSpecs give the 3-row conv window overlap without read
  amplification);
- LeakyReLU runs on the VPU on the loaded block;
- the four phase taps are (W+1, Ci) @ (Ci, 4Co) MXU dots accumulated
  in f32;
- the BN eval affine (phase-tiled, see models/layers.BatchNorm) applies
  to the f32 accumulator;
- the bf16 result is column-interleaved (the depth-to-space) in VMEM
  and stored as finished output rows.

Numerics match the unfused path op-for-op (bf16 leaky, bf16 MXU dots
with f32 accumulation, f32 affine, bf16 store); the only reassociation
is the dot accumulation order, same as any conv tiling change.

Correctness is tested against the unfused composition in
tests/test_pallas_decoder.py.

**A/B RESULT (v5e, measured): REJECTED for production.** At the
flagship MNet decoder shapes (batch 128, bf16):

    shape (HxW, Ci->Co)   XLA unfused   this kernel (flattened dots)
    16x16, 1024->256        6.02 ms/step   6.24 ms/step  (-4%)
    32x32,  512->128        7.27 ms/step   6.96 ms/step  (+4%)
    8x8,   512->512         4.25 ms/step   Mosaic internal compile error
    64x64,  256->64        11.59 ms/step   Mosaic internal compile error

(A per-row-dot variant compiled at 8x8 but ran 32-54% slower — MXU
starvation at M = W+1.) Even where it compiles, fusing the LeakyReLU +
affine + d2s into the conv only TIES XLA: the saved elementwise
bandwidth is fully offset by the hand-written dots' lower MXU
efficiency vs XLA's conv emitter, and two of the four shapes hit
toolchain ICEs. The kernel stays in-tree as measured evidence and a
base for revisiting when Mosaic matures; the production decoder keeps
the XLA path plus the phase-affine bf16-d2s fix (models/mnet.py::_Up).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, top_ref, bot_ref, k_ref, scale_ref, bias_ref, out_ref,
            *, rows: int, w: int, co: int):
    """One (image, row-block) program: R input rows -> 2R output rows."""
    # assemble the padded row window: (R+2, W, Ci)
    a = jnp.concatenate([top_ref[0], x_ref[0], bot_ref[0]], axis=0)
    a = jnp.maximum(a, 0.2 * a)  # LeakyReLU on the VPU, bf16
    # edge column pad -> (R+2, W+2, Ci)
    ap = jnp.concatenate([a[:, :1], a, a[:, -1:]], axis=1)

    scale = scale_ref[:]  # (1, 4Co) f32
    bias = bias_ref[:]

    # one BIG dot per tap: M = (R+1)*(W+1) keeps the 128-row MXU fed
    # (per-row dots with M = W+1 measured 35% slower at small layers)
    m = (rows + 1) * (w + 1)
    ci = ap.shape[-1]

    def tap(di, dj):
        return ap[di:di + rows + 1, dj:dj + w + 1, :].reshape(m, ci)

    acc = jnp.dot(tap(0, 0), k_ref[0], preferred_element_type=jnp.float32)
    acc += jnp.dot(tap(0, 1), k_ref[1], preferred_element_type=jnp.float32)
    acc += jnp.dot(tap(1, 0), k_ref[2], preferred_element_type=jnp.float32)
    acc += jnp.dot(tap(1, 1), k_ref[3], preferred_element_type=jnp.float32)
    y = ((acc * scale + bias).astype(out_ref.dtype)
         .reshape(rows + 1, w + 1, 4 * co))

    def interleave(left, right):
        """(W, Co) x2 -> (2W, Co) with left in even columns."""
        return jnp.stack([left, right], axis=1).reshape(2 * w, co)

    for i in range(rows + 1):
        if i < rows:
            # even output row 2i: phases ee (cols 0..W-1) / eo (1..W)
            out_ref[0, 2 * i] = interleave(y[i, 0:w, 0:co],
                                           y[i, 1:w + 1, co:2 * co])
        if i > 0:
            # odd output row 2i-1: phases oe / oo of y row i
            out_ref[0, 2 * i - 1] = interleave(
                y[i, 0:w, 2 * co:3 * co], y[i, 1:w + 1, 3 * co:4 * co])


def _pick_rows(h: int) -> int:
    for r in (8, 4, 2):
        if h % r == 0:
            return r
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_decoder_upsample(x, w4, scale4, bias4, interpret: bool = False):
    """LeakyReLU -> phase conv -> eval-BN affine -> d2s, fused.

    Args:
      x: (N, H, W, Ci) activations (pre-LeakyReLU), bf16 (or f32).
      w4: (2, 2, Ci, 4Co) phase kernel (models/layers.subpixel_phase_kernel
          of the 3x3 conv weight), same dtype as x.
      scale4/bias4: (4Co,) f32 — the PHASE-TILED eval affine
          (jnp.tile of scale/rsqrt(var+eps) and bias - mean*...,
          see BatchNorm.__call__(tile=4)).
    Returns:
      (N, 2H, 2W, Co) in x.dtype.
    """
    n, h, w, ci = x.shape
    co = w4.shape[-1] // 4
    rows = _pick_rows(h)
    taps = w4.reshape(4, ci, 4 * co)

    grid = (n, h // rows)
    kernel = functools.partial(_kernel, rows=rows, w=w, co=co)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, w, ci), lambda i, r: (i, r, 0, 0)),
            # single-row halos; block-index units = rows here, so the
            # clamped row index IS the block index
            pl.BlockSpec((1, 1, w, ci),
                         lambda i, r: (i, jnp.maximum(r * rows - 1, 0),
                                       0, 0)),
            pl.BlockSpec((1, 1, w, ci),
                         lambda i, r: (i, jnp.minimum(r * rows + rows,
                                                      h - 1), 0, 0)),
            pl.BlockSpec((4, ci, 4 * co), lambda i, r: (0, 0, 0)),
            pl.BlockSpec((1, 4 * co), lambda i, r: (0, 0)),
            pl.BlockSpec((1, 4 * co), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * rows, 2 * w, co),
                               lambda i, r: (i, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, co), x.dtype),
        interpret=interpret,
    )(x, x, x, taps, scale4.reshape(1, -1).astype(jnp.float32),
      bias4.reshape(1, -1).astype(jnp.float32))


def reference_decoder_upsample(x, w4, scale4, bias4):
    """The unfused composition (what XLA runs today) for A/B testing."""
    from shadow_removal_istd_tpu.models.layers import (
        subpixel_depth_to_space,
    )
    n, h, w, ci = x.shape
    co = w4.shape[-1] // 4
    a = jnp.maximum(x, 0.2 * x)
    ap = jnp.pad(a, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        ap, w4.astype(ap.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = (y.astype(jnp.float32) * scale4 + bias4).astype(x.dtype)
    return subpixel_depth_to_space(y, h, w, co)
