"""SoftAdapt dynamic loss weighting, as a functional state + update.

Reference: src/loss.py:115-191 (present there but commented out of the
trainer at src/cgan.py:164-169; available here as a first-class option).
Weights follow a softmax over normalized loss gradients with EMA
smoothing alpha=0.9.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class SoftAdaptState(NamedTuple):
    weights: jnp.ndarray    # (n,) current mixture weights (sum 1)
    prev_loss: jnp.ndarray  # (n,) previous losses


def softadapt_init(n: int, init_weights: Sequence[float] | None = None):
    if init_weights is None:
        w = jnp.ones((n,)) / n
    else:
        w = jnp.asarray(init_weights, jnp.float32)
        w = w / w.sum()
    return SoftAdaptState(weights=w, prev_loss=jnp.ones((n,)))


def softadapt_update(state: SoftAdaptState, losses: jnp.ndarray,
                     beta: float = 0.1, epsilon: float = 1e-8,
                     weighted: bool = True, normalized: bool = True,
                     alpha: float = 0.9) -> SoftAdaptState:
    """One weight update from the current (detached) loss vector."""
    losses = jax.lax.stop_gradient(losses)
    grad = losses - state.prev_loss
    if normalized:  # relative ratios instead of absolute values
        grad = grad / jnp.clip(state.prev_loss, min=epsilon)
    grad = grad - grad.max()
    new_w = jax.nn.softmax(beta * grad)
    if weighted:  # account for losses of different ranges
        new_w = new_w * (state.prev_loss.sum() - state.prev_loss)
        new_w = new_w / new_w.sum()
    weights = alpha * state.weights + (1 - alpha) * new_w
    return SoftAdaptState(weights=weights, prev_loss=losses)


def softadapt_combine(state: SoftAdaptState, losses: jnp.ndarray):
    """Weighted total loss; the weights carry no gradient."""
    return jnp.sum(losses * jax.lax.stop_gradient(state.weights))
