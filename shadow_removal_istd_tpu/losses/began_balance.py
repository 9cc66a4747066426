"""BEGAN k-balance: proportional control of the D fake-term weight.

Reference: src/cgan.py:211-213 (k init 0), 290-297 (D loss =
L(real) - k * L(fake) with L1 reconstruction), 352-360 (k update with
gamma=0.7, lambda_k=0.001, clipped to [0, 1]).
"""

from __future__ import annotations

import jax.numpy as jnp

GAMMA = 0.7
LAMBDA_K = 0.001


def began_d_loss(k, loss_real, loss_fake):
    """D objective: reconstruction of real minus k * reconstruction of fake."""
    return loss_real - k * loss_fake


def began_k_update(k, loss_real, loss_fake,
                   gamma: float = GAMMA, lambda_k: float = LAMBDA_K):
    """k <- clip(k + lambda_k * (gamma * L_real - L_fake), 0, 1)."""
    balance = gamma * loss_real - loss_fake
    return jnp.clip(k + lambda_k * balance, 0.0, 1.0)
