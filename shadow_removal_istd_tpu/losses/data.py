"""Data (pixel) losses (reference: src/loss.py:14-26 DataLoss = mean L1)."""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error."""
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error."""
    return jnp.mean((pred - target) ** 2)
