"""VGG-19-BN perceptual ("visual") loss.

Reference semantics (src/loss.py:29-56): map predictions/targets from
[-1,1] to [0,1], ImageNet-normalize, run frozen vgg19_bn features through
pool4, MSE between feature maps, target branch under stop-gradient.

The reference feeds its BGR training tensors straight into the RGB-
normalized ImageNet VGG (quirk preserved by default: we also apply the
loss to whatever channel order the engine trains in). Single-channel
mattes are broadcast to 3 channels as the engine does
(reference src/cgan.py:334-335 ``expand(-1, 3, -1, -1)``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.models.vgg import (
    VGG19Features,
    imagenet_normalize,
)

_vgg = VGG19Features()


def _features(variables: Any, img_pm1: jnp.ndarray) -> jnp.ndarray:
    img = img_pm1 * 0.5 + 0.5
    if img.shape[-1] == 1:
        img = jnp.broadcast_to(img, img.shape[:-1] + (3,))
    return _vgg.apply(variables, imagenet_normalize(img))


def visual_loss(vgg_variables: Any, pred_pm1: jnp.ndarray,
                target_pm1: jnp.ndarray) -> jnp.ndarray:
    """Feature-space MSE; gradient flows through the pred branch only."""
    f_pred = _features(vgg_variables, pred_pm1)
    f_target = jax.lax.stop_gradient(_features(vgg_variables, target_pm1))
    return jnp.mean((f_pred - f_target) ** 2)
