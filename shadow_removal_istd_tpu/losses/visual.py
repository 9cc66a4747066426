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


def sp_visual_loss(vgg_variables: Any, x_norm: jnp.ndarray,
                   sp_pred: jnp.ndarray,
                   img_target01: jnp.ndarray) -> jnp.ndarray:
    """Legacy sp-space perceptual loss (reference STCGAN/loss.py:42-56).

    The predicted shadow parameters reconstruct the shadow-free image:
    the mean/std-normalized input is denormalized with the ISTD dataset
    statistics (dataset_h5.py:16-18), multiplied by ``sp_pred`` and
    clamped to [0,1]; VGG features of that reconstruction are matched
    against features of the [0,1] target. Reference quirks preserved:
    NO ImageNet normalization before the VGG (unlike the new tree's
    VisualLoss), and the target branch is under no_grad.

    Dormant in the reference (STCGAN/stcgan.py never instantiates it);
    provided for API completeness — see PARITY.md.
    """
    from shadow_removal_istd_tpu.data.h5 import ISTD_MEAN, ISTD_STD

    img_in = x_norm * jnp.asarray(ISTD_STD) + jnp.asarray(ISTD_MEAN)
    img_pred = jnp.clip(sp_pred * img_in, 0.0, 1.0)
    f_pred = _vgg.apply(vgg_variables, img_pred)
    f_target = jax.lax.stop_gradient(
        _vgg.apply(vgg_variables, img_target01))
    return jnp.mean((f_pred - f_target) ** 2)
