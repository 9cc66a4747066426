"""Data (pixel) losses (reference: src/loss.py:14-26 DataLoss = mean L1)."""

from __future__ import annotations

import jax.numpy as jnp


def _acc(x: jnp.ndarray) -> jnp.ndarray:
    """Accumulation dtype: f32 under bf16 compute, f64 stays f64
    (x64 parity harnesses)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (accumulated in >=float32)."""
    return jnp.mean(jnp.abs(_acc(pred) - _acc(target)))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (accumulated in >=float32)."""
    diff = _acc(pred) - _acc(target)
    return jnp.mean(diff ** 2)
