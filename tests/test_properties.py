"""Property-based tests (hypothesis) for core op invariants.

These encode the contracts the reference relies on implicitly —
synchronized augmentation draws, interpolation weight normalization,
quantization error bounds, LAB color axioms — over randomized shapes
and values rather than fixed fixtures.
"""
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax
import jax.numpy as jnp

COMMON = dict(deadline=None, max_examples=20, derandomize=True)


class TestAugmentSync:
    @settings(**COMMON)
    @given(seed=st.integers(0, 2**31 - 1),
           h=st.sampled_from([40, 48, 64]),
           w=st.sampled_from([40, 64]))
    def test_duplicate_streams_stay_identical(self, seed, h, w):
        """The reference's core augmentation invariant: one random draw
        for the whole (img, matte, target) group (src/transform.py:67).
        Feeding the SAME image as two streams must produce identical
        outputs — any desynchronized draw breaks this."""
        from shadow_removal_istd_tpu.ops.augment import (
            AugmentConfig, augment_batch)
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
        cfg = AugmentConfig(scale=0.05, angle=15, flip_prob=0.5,
                            crop_size=32, method="gather")
        a, b = augment_batch(jax.random.key(seed),
                             (jnp.asarray(img), jnp.asarray(img)), cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @settings(**COMMON)
    @given(seed=st.integers(0, 2**31 - 1))
    def test_output_range_and_shape(self, seed):
        from shadow_removal_istd_tpu.ops.augment import (
            AugmentConfig, augment_batch)
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (3, 48, 48, 3), dtype=np.uint8)
        matte = rng.integers(0, 256, (3, 48, 48, 1), dtype=np.uint8)
        cfg = AugmentConfig(scale=0.05, angle=15, flip_prob=0.5,
                            crop_size=32, method="gather")
        a, m = augment_batch(jax.random.key(seed),
                             (jnp.asarray(img), jnp.asarray(matte)), cfg)
        assert a.shape == (3, 32, 32, 3) and m.shape == (3, 32, 32, 1)
        assert float(jnp.min(a)) >= -1.0 - 1e-6
        assert float(jnp.max(a)) <= 1.0 + 1e-6


class TestResizeWeights:
    @settings(**COMMON)
    @given(n=st.integers(2, 200), m=st.integers(2, 200))
    def test_rows_are_convex_combinations(self, n, m):
        """Every output pixel of both cv2 interpolation modes is a convex
        combination of inputs: rows sum to 1, weights non-negative —
        resizing a constant image must return that constant."""
        from shadow_removal_istd_tpu.ops.resize import (
            resize_matrix_area, resize_matrix_linear)
        for mat in (resize_matrix_linear(n, m), resize_matrix_area(n, m)):
            assert mat.shape == (m, n)
            np.testing.assert_allclose(mat.sum(axis=1), 1.0, atol=1e-5)
            assert (mat >= -1e-7).all()


class TestQuantBounds:
    @settings(**COMMON)
    @given(seed=st.integers(0, 2**31 - 1),
           amax=st.floats(0.1, 100.0, allow_nan=False))
    def test_roundtrip_error_half_step(self, seed, amax):
        """Symmetric int8: |dequant(quant(x)) - x| <= scale/2 for
        |x| <= amax (no saturation)."""
        from shadow_removal_istd_tpu.models.quant import _quantize
        rng = np.random.default_rng(seed)
        x = (rng.uniform(-1, 1, (64,)) * amax).astype(np.float32)
        scale = np.float32(amax / 127.0)
        back = np.asarray(_quantize(jnp.asarray(x), scale),
                          dtype=np.float32) * scale
        assert np.abs(back - x).max() <= scale / 2 + 1e-6


class TestLabAxioms:
    @settings(**COMMON)
    @given(g=st.floats(0.0, 1.0, allow_nan=False))
    def test_gray_has_zero_chroma(self, g):
        from shadow_removal_istd_tpu.ops.color import rgb_to_lab
        lab = np.asarray(rgb_to_lab(jnp.full((1, 1, 3), g, jnp.float32)))
        assert abs(lab[0, 0, 1]) < 1e-2 and abs(lab[0, 0, 2]) < 1e-2
        assert -1e-4 <= lab[0, 0, 0] <= 100.0 + 1e-4

    @settings(**COMMON)
    @given(g1=st.floats(0.0, 1.0), g2=st.floats(0.0, 1.0))
    def test_lightness_monotone_in_gray(self, g1, g2):
        from shadow_removal_istd_tpu.ops.color import rgb_to_lab
        if abs(g1 - g2) < 1e-6:
            return
        lo, hi = sorted((g1, g2))
        f = lambda g: float(np.asarray(rgb_to_lab(  # noqa: E731
            jnp.full((1, 1, 3), g, jnp.float32)))[0, 0, 0])
        assert f(lo) <= f(hi) + 1e-5


class TestSubpixelEquivalence:
    @settings(deadline=None, max_examples=10, derandomize=True)
    @given(seed=st.integers(0, 2**31 - 1),
           h=st.integers(2, 12), w=st.integers(2, 12),
           ci=st.sampled_from([1, 3, 5]), co=st.sampled_from([1, 4]))
    def test_matches_naive_upsample_conv(self, seed, h, w, ci, co):
        """The subpixel decomposition equals the materialized
        nearest-2x upsample + 3x3 reflect conv for any shape."""
        from shadow_removal_istd_tpu.models.layers import (
            _subpixel_nn_conv, upsample_nearest)
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((1, h, w, ci)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.1,
                        jnp.float32)
        with jax.default_matmul_precision("highest"):
            got = _subpixel_nn_conv(x, k)
            up = upsample_nearest(x, 2)
            ref = jax.lax.conv_general_dilated(
                jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)),
                        mode="reflect"),
                k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
