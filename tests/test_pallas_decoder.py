"""Fused Pallas decoder-upsample kernel vs the unfused composition."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shadow_removal_istd_tpu.ops.pallas_decoder import (
    fused_decoder_upsample,
    reference_decoder_upsample,
)


def _inputs(n, h, w, ci, co, dtype, seed=0):
    k = jax.random.key(seed)
    ks = jax.random.split(k, 4)
    x = (jax.random.normal(ks[0], (n, h, w, ci)) * 0.5).astype(dtype)
    w4 = (jax.random.normal(ks[1], (2, 2, ci, 4 * co)) * 0.05).astype(dtype)
    scale4 = jnp.tile(jax.random.uniform(ks[2], (co,)) + 0.5, 4)
    bias4 = jnp.tile(jax.random.normal(ks[3], (co,)) * 0.1, 4)
    return x, w4, scale4, bias4


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 16, 8),      # inner decoder-ish, R=8
    (1, 12, 16, 8, 8),     # H%8 != 0 -> R=4
    (2, 6, 10, 8, 16),     # H%4 != 0 -> R=2
    (1, 16, 16, 32, 8),    # multi-row-block
])
def test_matches_unfused_composition(shape):
    n, h, w, ci, co = shape
    x, w4, s4, b4 = _inputs(n, h, w, ci, co, jnp.float32)
    got = fused_decoder_upsample(x, w4, s4, b4, interpret=True)
    want = reference_decoder_upsample(x, w4, s4, b4)
    assert got.shape == (n, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bf16_matches_unfused_bf16():
    x, w4, s4, b4 = _inputs(1, 8, 16, 16, 8, jnp.bfloat16)
    got = fused_decoder_upsample(x, w4, s4, b4, interpret=True)
    want = reference_decoder_upsample(x, w4, s4, b4)
    # same op/dtype sequence; only dot-accumulation order differs
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)


def test_edge_rows_use_edge_padding():
    """The top/bottom halo clamps must reproduce edge padding exactly:
    compare against a taller array's interior."""
    x, w4, s4, b4 = _inputs(1, 8, 8, 8, 8, jnp.float32, seed=3)
    got = fused_decoder_upsample(x, w4, s4, b4, interpret=True)
    want = reference_decoder_upsample(x, w4, s4, b4)
    np.testing.assert_allclose(np.asarray(got[:, :2]),
                               np.asarray(want[:, :2]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[:, -2:]),
                               np.asarray(want[:, -2:]), atol=2e-5)
