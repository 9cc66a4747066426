"""Golden tests for image ops against OpenCV (the reference's backend)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.ops import (
    affine_warp,
    bgr_to_rgb,
    invert_affine,
    resize,
    resize_area,
    resize_linear,
    rgb_to_lab,
    rotation_scale_matrix,
)
from shadow_removal_istd_tpu.ops.augment import (
    AugmentConfig,
    augment_batch,
    denormalize,
    float_to_uint8,
    normalize_batch,
)

cv = pytest.importorskip("cv2")


def _rand_img(rng, h=48, w=64, c=3):
    return rng.uniform(0, 1, size=(h, w, c)).astype(np.float32)


class TestResize:
    def test_linear_matches_cv2_upscale(self, rng):
        img = _rand_img(rng, 30, 40)
        ours = np.asarray(resize_linear(jnp.asarray(img), (60, 80)))
        ref = cv.resize(img, (80, 60), interpolation=cv.INTER_LINEAR)
        # cv2 resize uses 11-bit fixed-point weights -> ~4e-3 max deviation
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_linear_matches_cv2_downscale(self, rng):
        img = _rand_img(rng, 64, 48)
        ours = np.asarray(resize_linear(jnp.asarray(img), (30, 20)))
        ref = cv.resize(img, (20, 30), interpolation=cv.INTER_LINEAR)
        np.testing.assert_allclose(ours, ref, atol=1e-2)

    def test_area_matches_cv2_integer_factor(self, rng):
        img = _rand_img(rng, 64, 64)
        ours = np.asarray(resize_area(jnp.asarray(img), (32, 32)))
        ref = cv.resize(img, (32, 32), interpolation=cv.INTER_AREA)
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_area_matches_cv2_fractional(self, rng):
        img = _rand_img(rng, 48, 64)
        ours = np.asarray(resize_area(jnp.asarray(img), (30, 40)))
        ref = cv.resize(img, (40, 30), interpolation=cv.INTER_AREA)
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_auto_picks_area_when_shrinking(self, rng):
        img = _rand_img(rng, 64, 64)
        auto = np.asarray(resize(jnp.asarray(img), (32, 32)))
        area = np.asarray(resize_area(jnp.asarray(img), (32, 32)))
        np.testing.assert_array_equal(auto, area)

    def test_batched(self, rng):
        imgs = rng.uniform(0, 1, size=(4, 32, 32, 3)).astype(np.float32)
        out = resize_linear(jnp.asarray(imgs), (16, 16))
        assert out.shape == (4, 16, 16, 3)
        single = resize_linear(jnp.asarray(imgs[0]), (16, 16))
        np.testing.assert_allclose(out[0], single, atol=1e-6)


class TestWarp:
    @pytest.mark.parametrize("angle,scale", [(13.0, 1.0), (0.0, 0.93),
                                             (-7.5, 1.04), (15.0, 0.95)])
    def test_matches_cv2_warpaffine(self, rng, angle, scale):
        img = _rand_img(rng, 40, 56)
        h, w = img.shape[:2]
        center = ((w - 1) / 2.0, (h - 1) / 2.0)
        m = rotation_scale_matrix(angle, scale, center)
        ours = np.asarray(affine_warp(jnp.asarray(img), invert_affine(m)))
        m_cv = cv.getRotationMatrix2D(center, angle, scale)
        np.testing.assert_allclose(np.asarray(m), m_cv, atol=1e-5)
        ref = cv.warpAffine(img, m_cv, (w, h), flags=cv.INTER_LINEAR,
                            borderMode=cv.BORDER_CONSTANT)
        # cv2 uses 5-bit fixed-point interpolation weights -> ~1/32 coord
        # quantization; allow a small absolute tolerance.
        np.testing.assert_allclose(ours, ref, atol=0.04)

    def test_identity_warp(self, rng):
        img = _rand_img(rng)
        m = rotation_scale_matrix(0.0, 1.0, (31.5, 23.5))
        out = np.asarray(affine_warp(jnp.asarray(img), invert_affine(m)))
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_flip(self, rng):
        img = _rand_img(rng)
        m = invert_affine(rotation_scale_matrix(0.0, 1.0, (31.5, 23.5)))
        out = np.asarray(affine_warp(jnp.asarray(img), m, flip=True))
        np.testing.assert_allclose(out, img[:, ::-1], atol=1e-5)

    def test_crop_offset(self, rng):
        img = _rand_img(rng, 48, 64)
        m = invert_affine(rotation_scale_matrix(0.0, 1.0, (31.5, 23.5)))
        out = np.asarray(affine_warp(jnp.asarray(img), m, out_shape=(16, 16),
                                     offset=(5.0, 9.0)))
        np.testing.assert_allclose(out, img[5:21, 9:25], atol=1e-5)


class TestColor:
    def test_rgb_to_lab_matches_cv2_float(self, rng):
        # cv2's float32 RGB2Lab uses the same D65 math as skimage but
        # approximates the sRGB gamma with an interpolated LUT (~0.4 LAB
        # deviation); we implement the exact skimage formula.
        img = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
        ours = np.asarray(rgb_to_lab(jnp.asarray(img)))
        ref = cv.cvtColor(img, cv.COLOR_RGB2Lab)
        np.testing.assert_allclose(ours, ref, atol=0.5)

    def test_rgb_to_lab_known_values(self):
        # Textbook sRGB->LAB (D65, 2deg) values, same as skimage.rgb2lab.
        colors = np.array([[1.0, 0.0, 0.0],
                           [0.0, 1.0, 0.0],
                           [0.0, 0.0, 1.0],
                           [0.5, 0.5, 0.5]], dtype=np.float32)
        expected = np.array([[53.2408, 80.0925, 67.2032],
                             [87.7347, -86.1827, 83.1793],
                             [32.2970, 79.1875, -107.8602],
                             [53.3890, 0.0, 0.0]])
        ours = np.asarray(rgb_to_lab(jnp.asarray(colors)))
        np.testing.assert_allclose(ours, expected, atol=0.01)

    def test_bgr_to_rgb(self, rng):
        img = _rand_img(rng)
        np.testing.assert_array_equal(
            np.asarray(bgr_to_rgb(jnp.asarray(img))), img[..., ::-1])

    def test_lab_range(self):
        white = jnp.ones((1, 1, 3))
        lab = np.asarray(rgb_to_lab(white))
        np.testing.assert_allclose(lab[0, 0, 0], 100.0, atol=0.01)
        np.testing.assert_allclose(lab[0, 0, 1:], 0.0, atol=0.02)


class TestAugment:
    def _streams(self, rng, n=2, h=96, w=128):
        img = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        matte = rng.integers(0, 256, size=(n, h, w, 1), dtype=np.uint8)
        target = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        return tuple(map(jnp.asarray, (img, matte, target)))

    def test_shapes_and_range(self, rng):
        streams = self._streams(rng)
        cfg = AugmentConfig(crop_size=64)
        out = augment_batch(jax.random.key(0), streams, cfg)
        assert out[0].shape == (2, 64, 64, 3)
        assert out[1].shape == (2, 64, 64, 1)
        assert out[2].shape == (2, 64, 64, 3)
        for o in out:
            assert o.dtype == jnp.float32
            assert float(o.min()) >= -1.0 - 1e-6
            assert float(o.max()) <= 1.0 + 1e-6

    def test_synchronized_draws(self, rng):
        # Feed the SAME image as two streams: outputs must be identical,
        # proving one random draw drives the whole group.
        img = rng.integers(0, 256, size=(3, 96, 128, 3), dtype=np.uint8)
        cfg = AugmentConfig(crop_size=64)
        a, b = augment_batch(
            jax.random.key(7), (jnp.asarray(img), jnp.asarray(img)), cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_deterministic_per_key(self, rng):
        streams = self._streams(rng)
        cfg = AugmentConfig(crop_size=64)
        o1 = augment_batch(jax.random.key(3), streams, cfg)
        o2 = augment_batch(jax.random.key(3), streams, cfg)
        np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
        o3 = augment_batch(jax.random.key(4), streams, cfg)
        assert not np.allclose(np.asarray(o1[0]), np.asarray(o3[0]))

    def test_no_aug_identity(self, rng):
        # zero scale/angle ranges, no flip -> pure crop + normalize.
        img = rng.integers(0, 256, size=(1, 80, 80, 3), dtype=np.uint8)
        cfg = AugmentConfig(scale=0.0, angle=0.0, flip_prob=0.0, crop_size=64)
        (out,) = augment_batch(jax.random.key(0), (jnp.asarray(img),), cfg)
        out = np.asarray(out)
        full = img[0].astype(np.float32) * (2 / 255) - 1
        # find the crop offset by matching the first pixel row/col
        found = False
        for r in range(17):
            for c in range(17):
                if np.allclose(out, full[r:r + 64, c:c + 64], atol=1e-4):
                    found = True
        assert found

    def test_crop_larger_than_image_pads_like_reference(self, rng):
        # Reference RandomCrop (src/transform.py:133-152): a crop
        # target larger than the image zero-pads and places the image
        # at a RANDOM position inside the black crop. Our fused warp
        # reproduces that with negative offsets + zero-fill.
        img = rng.integers(1, 256, size=(16, 40, 40, 3), dtype=np.uint8)
        cfg = AugmentConfig(scale=0.0, angle=0.0, flip_prob=0.0,
                            crop_size=64)
        (out,) = augment_batch(jax.random.key(2), (jnp.asarray(img),),
                               cfg)
        out = np.asarray(out)
        assert out.shape == (16, 64, 64, 3)
        # zero-fill normalizes to -1: each crop has exactly 40*40
        # non-border pixels
        live = (out > -1 + 1e-6).any(axis=-1)
        assert (live.sum(axis=(1, 2)) == 40 * 40).all()
        # and the placement is randomized across the batch, not pinned
        corners = {tuple(np.argwhere(lv)[0]) for lv in live}
        assert len(corners) > 1, corners

    def test_crop_equal_to_image_is_identity_offset(self, rng):
        # dim == crop: offset 0 (the reference's randint(0, 0) would
        # raise — documented divergence in sample_augment_params)
        img = rng.integers(0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
        cfg = AugmentConfig(scale=0.0, angle=0.0, flip_prob=0.0,
                            crop_size=64)
        (out,) = augment_batch(jax.random.key(0), (jnp.asarray(img),),
                               cfg)
        full = img.astype(np.float32) * (2 / 255) - 1
        np.testing.assert_allclose(np.asarray(out), full, atol=1e-4)

    def test_normalize_roundtrip(self, rng):
        img = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
        (norm,) = normalize_batch((jnp.asarray(img),))
        back = float_to_uint8(denormalize(norm))
        # float_to_uint8 truncates like the reference (src/utils.py:65-67),
        # so float32 rounding can land one code value below.
        diff = np.abs(back.astype(np.int32) - img.astype(np.int32))
        assert diff.max() <= 1


class TestReferenceChainParity:
    def test_composed_warp_vs_cv2_two_pass_chain(self, rng):
        """The reference applies scale and rotation as two separate
        cv2.warpAffine resamples (src/transform.py:59-100); our fused
        path composes them into one. On smooth images the composed
        single resample tracks the two-pass chain closely (it is
        strictly *less* interpolation blur)."""
        h, w = 96, 128
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        img = np.stack([np.sin(xx / 9) + np.cos(yy / 7),
                        np.cos(xx / 13), (xx + yy) / (h + w)],
                       -1).astype(np.float32)
        scale, angle = 0.97, 9.0
        ro, co, crop = 10, 20, 64
        center = ((w - 1) / 2.0, (h - 1) / 2.0)
        m1 = cv.getRotationMatrix2D(center, 0, scale)
        i1 = cv.warpAffine(img, m1, (w, h), flags=cv.INTER_AREA,
                           borderMode=cv.BORDER_CONSTANT)
        m2 = cv.getRotationMatrix2D(center, angle, 1)
        i2 = cv.warpAffine(i1, m2, (w, h), flags=cv.INTER_LINEAR,
                           borderMode=cv.BORDER_CONSTANT)
        ref = i2[ro:ro + crop, co:co + crop]
        m = rotation_scale_matrix(angle, scale, center)
        ours = np.asarray(affine_warp(
            jnp.asarray(img), invert_affine(m), out_shape=(crop, crop),
            offset=(float(ro), float(co))))
        diff = np.abs(ours - ref)
        assert diff.mean() < 5e-3
        assert diff.max() < 5e-2
