"""Synchronized random augmentations as pure JAX functions.

The reference augments with a chain of OpenCV host ops where one random
draw applies to every image of the (shadow, matte, shadow-free) group:
RandomScale(±5%) -> RandomRotate(±15°) -> RandomHorizontalFlip(0.5) ->
RandomCrop(256) -> [-1,1] normalize (reference: src/transform.py:59-156,
src/dataset.py:149-153, wired in src/cgan.py:105-110).

Here the whole chain is ONE bilinear gather on device:

- scale and rotation about the same center commute, so they compose into a
  single rotation-scale affine (the reference resamples twice; composing
  resamples once — strictly less interpolation blur);
- the horizontal flip is a column mirror of the destination plane;
- the random crop is an offset of the output grid;
- all streams of the group are concatenated on the channel axis so the
  triplet is warped by a single gather with identical random draws —
  the reference's core synchronization invariant by construction.

Input is uint8 NHWC straight from disk (4x less host->device traffic than
float32); normalization to [-1,1] happens on device in the same kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
import logging

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.ops.warp import (
    affine_warp,
    invert_affine,
    rotation_scale_matrix,
)


@dataclass(frozen=True)
class AugmentConfig:
    """Random augmentation ranges (reference defaults: src/main.py:160-171).

    scale: max relative scale jitter (draw from U[1-s, 1+s]).
    angle: max rotation in degrees (draw from U[-a, a]).
    flip_prob: probability of horizontal flip.
    crop_size: output crop (rows == cols == crop_size).
    """

    scale: float = 0.05
    angle: float = 15.0
    flip_prob: float = 0.5
    crop_size: int = 256
    # optional pre-aug resize (rows, cols) — the legacy tree resizes to
    # (300, 400) before augmenting (reference STCGAN/stcgan.py:77-82).
    # Done exactly (separate area/linear resample via matmuls), not
    # folded into the warp, to preserve INTER_AREA semantics.
    resize: tuple | None = None
    # "gather": one exact bilinear gather (cv2-parity path).
    # "shear":  Pallas 3-shear rotation + MXU matmul scaling — the fast
    #           training path (dynamic slices instead of gathers; the
    #           interpolation footprint differs slightly from cv2).
    method: str = "gather"
    # Run the Pallas kernel in interpreter mode. Set when the target
    # devices are NOT TPUs even though the default backend is one (e.g.
    # a CPU mesh selected via --devices cpu under a TPU-default
    # process): Mosaic only compiles for TPU, and the in-kernel
    # default_backend() check can't see where a jitted caller will
    # place the computation. See pallas_shear.should_interpret.
    pallas_interpret: bool = False


def sample_augment_params(key: jax.Array, batch: int,
                          image_shape: tuple[int, int],
                          cfg: AugmentConfig) -> dict:
    """Draw per-sample augmentation parameters for a batch.

    One draw per sample per transform, shared across every stream of the
    group (the reference draws once per __call__ over the whole tuple,
    src/transform.py:67,91,109,141-142).
    """
    h, w = image_shape
    k_scale, k_angle, k_flip, k_row, k_col = jax.random.split(key, 5)
    scale = jax.random.uniform(
        k_scale, (batch,), minval=1.0 - cfg.scale, maxval=1.0 + cfg.scale)
    angle = jax.random.uniform(
        k_angle, (batch,), minval=-cfg.angle, maxval=cfg.angle)
    # Reference flips when rand() <= flip_prob (src/transform.py:109).
    flip = jax.random.uniform(k_flip, (batch,)) <= cfg.flip_prob

    def _off_range(dim: int) -> tuple[int, int]:
        # Reference RandomCrop (src/transform.py:132-152): crop inside
        # the image draws randint(0, dim - crop); a crop LARGER than
        # the image zero-pads symmetrically and draws over the padded
        # canvas, which relative to the image is [-(crop - dim), 0) —
        # the image lands at a random position inside the black crop.
        # (affine_warp zero-fills out-of-bounds taps, so a negative
        # offset reproduces the padding.) Divergence kept: dim == crop
        # returns offset 0, where the reference's randint(0, 0) raises.
        if dim > cfg.crop_size:
            return 0, dim - cfg.crop_size
        if dim == cfg.crop_size:
            return 0, 1
        return -(cfg.crop_size - dim), 0

    r_lo, r_hi = _off_range(h)
    c_lo, c_hi = _off_range(w)
    if r_lo < 0 or c_lo < 0:
        logging.getLogger(__name__).warning(
            "crop_size %d exceeds the %dx%d image: crops are zero-"
            "padded with the image randomly placed (reference "
            "RandomCrop padding semantics, src/transform.py:133-152)",
            cfg.crop_size, h, w)
    row_off = jax.random.randint(k_row, (batch,), r_lo, r_hi)
    col_off = jax.random.randint(k_col, (batch,), c_lo, c_hi)
    return {"scale": scale, "angle": angle, "flip": flip,
            "row_off": row_off, "col_off": col_off}


def _augment_one(img: jnp.ndarray, scale, angle, flip, row_off, col_off,
                 crop_size: int) -> jnp.ndarray:
    """Fused warp+flip+crop of a single (H, W, C) image."""
    h, w = img.shape[0], img.shape[1]
    center = ((w - 1) / 2.0, (h - 1) / 2.0)
    fwd = rotation_scale_matrix(angle, scale, center)
    inv = invert_affine(fwd)
    return affine_warp(
        img, inv,
        out_shape=(crop_size, crop_size),
        offset=(row_off.astype(jnp.float32), col_off.astype(jnp.float32)),
        flip=flip,
    )


def augment_batch(key: jax.Array, streams: tuple[jnp.ndarray, ...],
                  cfg: AugmentConfig) -> tuple[jnp.ndarray, ...]:
    """Augment a group of NHWC streams with synchronized random draws.

    ``streams`` — e.g. (img NHW3 uint8, matte NHW1 uint8, target NHW3
    uint8). Returns float32 crops in [-1, 1], same order.
    """
    batch = streams[0].shape[0]

    # Concatenate every stream on channels: one gather warps the group.
    # uint8 stays uint8 through the gather (4x less traffic); the warp
    # returns float32.
    splits = [s.shape[-1] for s in streams]
    stacked = jnp.concatenate(list(streams), axis=-1)

    if cfg.resize is not None:
        from shadow_removal_istd_tpu.ops.resize import resize as _resize
        stacked = _resize(stacked.astype(jnp.float32), cfg.resize,
                          method="auto")

    h, w = stacked.shape[1], stacked.shape[2]
    params = sample_augment_params(key, batch, (h, w), cfg)

    use_shear = (cfg.method == "shear"
                 and h % 8 == 0 and w % 8 == 0 and cfg.crop_size % 8 == 0)
    if cfg.method == "shear" and not use_shear:
        # the Pallas row-block layout needs /8-divisible dims; odd-sized
        # datasets silently take the exact gather path instead
        pass
    if use_shear:
        from shadow_removal_istd_tpu.ops.pallas_shear import (
            fused_augment_shear,
        )
        warped = fused_augment_shear(stacked, params, cfg.crop_size,
                                     max_angle_deg=cfg.angle,
                                     interpret=cfg.pallas_interpret)
    else:
        warped = jax.vmap(
            _augment_one, in_axes=(0, 0, 0, 0, 0, 0, None)
        )(stacked, params["scale"], params["angle"], params["flip"],
          params["row_off"], params["col_off"], cfg.crop_size)

        # uint8 [0,255] -> [-1, 1] (reference: uint2float then (x-0.5)*2,
        # src/utils.py:60-62, src/dataset.py:149-153).
        warped = warped * (2.0 / 255.0) - 1.0

    out, start = [], 0
    for c in splits:
        out.append(warped[..., start:start + c])
        start += c
    return tuple(out)


def normalize_batch(streams: tuple[jnp.ndarray, ...]) -> tuple:
    """uint8 NHWC -> float32 [-1,1], no augmentation (validation path)."""
    return tuple(s.astype(jnp.float32) * (2.0 / 255.0) - 1.0 for s in streams)


def denormalize(img: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] float -> [0,1] float (reference: src/cgan.py:441-442)."""
    return img * 0.5 + 0.5


def float_to_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float -> uint8 with clipping (reference: src/utils.py:65-67)."""
    return (jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
