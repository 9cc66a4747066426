"""Pallas shear-warp kernel tests (interpret mode on the CPU backend)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.ops import pallas_shear
from shadow_removal_istd_tpu.ops.augment import AugmentConfig, augment_batch
from shadow_removal_istd_tpu.ops.warp import (
    affine_warp,
    invert_affine,
    rotation_scale_matrix,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    """Run the kernel through the Pallas interpreter on CPU."""
    orig = pallas_shear.hshear

    def patched(img, shifts, out_w, pad, interpret=False):
        return orig(img, shifts, out_w, pad, interpret=True)

    monkeypatch.setattr(pallas_shear, "hshear", patched)


def _smooth(h=96, w=128, n=2):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (127 + 60 * np.sin(xx / 11) * np.cos(yy / 13)).astype(np.uint8)
    return np.stack([img] * 3, -1)[None].repeat(n, 0)


class TestHShear:
    def test_matches_reference_lerp(self, rng):
        B, C, H, W = 2, 7, 16, 64
        img = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
        pad = 8
        padded = np.pad(img, ((0, 0), (0, 0), (0, 0), (pad, pad)))
        shifts = rng.uniform(-4, 4, (B, H)).astype(np.float32)
        out = np.asarray(pallas_shear.hshear(
            jnp.asarray(img), jnp.asarray(shifts), W, pad))
        ref = np.zeros_like(out)
        for b in range(B):
            for r in range(H):
                src = shifts[b, r] + pad + np.arange(W)
                k = np.floor(src).astype(int)
                f = src - k
                row = padded[b, :, r, :]
                ref[b, :, r, :] = row[:, k] * (1 - f) + row[:, k + 1] * f
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_zero_shift_identity(self, rng):
        B, C, H, W = 1, 3, 8, 128
        img = rng.uniform(0, 1, (B, C, H, W)).astype(np.float32)
        pad = 8
        out = np.asarray(pallas_shear.hshear(
            jnp.asarray(img), jnp.zeros((B, H), np.float32), W, pad))
        np.testing.assert_allclose(out, img, atol=1e-6)


class TestShearRotate:
    @pytest.mark.parametrize("angle", [0.0, 7.0, -12.0])
    def test_matches_exact_warp(self, angle):
        img = _smooth(n=1)[0].astype(np.float32)
        h, w = img.shape[:2]
        crop, ro, co = 48, 20, 30
        fast = np.asarray(pallas_shear.shear_rotate_crop(
            jnp.asarray(img[None]), jnp.asarray([angle]),
            jnp.asarray([float(ro)]), jnp.asarray([float(co)]), crop,
            interpret=True))[0]
        m = rotation_scale_matrix(angle, 1.0, ((w - 1) / 2, (h - 1) / 2))
        exact = np.asarray(affine_warp(
            jnp.asarray(img), invert_affine(m), out_shape=(crop, crop),
            offset=(float(ro), float(co))))
        # three 1-D resamples vs one 2-D: tiny interior deviation
        assert np.abs(fast - exact).mean() < 0.01 * 255
        assert np.median(np.abs(fast - exact)) < 0.005 * 255


class TestShearAugmentPath:
    def test_close_to_gather_path(self):
        streams = (jnp.asarray(_smooth(n=3)),)
        k = jax.random.key(5)
        (a,) = augment_batch(k, streams,
                             AugmentConfig(crop_size=64, method="gather"))
        (b,) = augment_batch(k, streams,
                             AugmentConfig(crop_size=64, method="shear"))
        d = np.abs(np.asarray(a) - np.asarray(b))
        assert d.mean() < 0.01
        # discrepancies confined to a border ring
        assert (d > 0.05).mean() < 0.005

    def test_identity_and_flip_exact(self):
        streams = (jnp.asarray(_smooth(n=2, h=80, w=80)),)
        for flip_p in (0.0, 1.0):
            cfg_g = AugmentConfig(scale=0.0, angle=0.0, flip_prob=flip_p,
                                  crop_size=64, method="gather")
            cfg_s = AugmentConfig(scale=0.0, angle=0.0, flip_prob=flip_p,
                                  crop_size=64, method="shear")
            (a,) = augment_batch(jax.random.key(1), streams, cfg_g)
            (b,) = augment_batch(jax.random.key(1), streams, cfg_s)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_synchronized_draws(self):
        img = jnp.asarray(_smooth(n=3))
        cfg = AugmentConfig(crop_size=64, method="shear")
        a, b = augment_batch(jax.random.key(7), (img, img), cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestLargeAngles:
    @pytest.mark.parametrize("angle", [25.0, -40.0])
    def test_padding_covers_large_rotations(self, angle):
        """pads are sized from the static angle bound, so large
        --aug-angle values stay geometrically correct (regression for
        the clamped-resample-window bug)."""
        img = _smooth(n=1)[0].astype(np.float32)
        h, w = img.shape[:2]
        crop, ro, co = 48, h - 48, w - 48  # far corner = worst case
        fast = np.asarray(pallas_shear.shear_rotate_crop(
            jnp.asarray(img[None]), jnp.asarray([angle]),
            jnp.asarray([float(ro)]), jnp.asarray([float(co)]), crop,
            max_angle_deg=abs(angle), interpret=True))[0]
        m = rotation_scale_matrix(angle, 1.0, ((w - 1) / 2, (h - 1) / 2))
        exact = np.asarray(affine_warp(
            jnp.asarray(img), invert_affine(m), out_shape=(crop, crop),
            offset=(float(ro), float(co))))
        # interior parity holds even at large angles (border ring aside)
        assert np.median(np.abs(fast - exact)) < 0.01 * 255
        assert np.abs(fast - exact).mean() < 0.02 * 255
