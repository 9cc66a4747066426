"""VGG-19-BN feature extractor for the perceptual (visual) loss.

Mirrors torchvision ``vgg19_bn(pretrained=True).features[:40]`` — conv
blocks 1-4 ending at pool4 — which the reference uses frozen as a feature
metric (reference: src/loss.py:40-41). BatchNorm always runs with its
(pretrained) running statistics, never batch stats, matching ``.eval()``.

Pretrained weights are loaded from an ``.npz`` produced by
``tools/convert_vgg.py`` (a one-time torchvision->npz conversion). With no
weights available the loss can run with random features (useful for tests
and ablations) or be disabled via lambda4=lambda5=0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torchvision vgg19 cfg "E" through pool4: features[:40].
VGG19_CFG_THROUGH_POOL4 = (
    64, 64, "M",
    128, 128, "M",
    256, 256, 256, 256, "M",
    512, 512, 512, 512, "M",
)

# ImageNet normalization applied to [0,1] inputs (reference src/loss.py:42-43)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


class VGG19Features(nn.Module):
    """Frozen VGG-19-BN features through pool4."""

    @nn.compact
    def __call__(self, x):
        for spec in VGG19_CFG_THROUGH_POOL4:
            if spec == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(spec, (3, 3), padding=((1, 1), (1, 1)),
                            use_bias=True)(x)
                # frozen BN: always running stats (torch .eval())
                x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5)(x)
                x = nn.relu(x)
        return x


def imagenet_normalize(img_01: jnp.ndarray) -> jnp.ndarray:
    """Normalize a [0,1] NHWC image with ImageNet statistics."""
    mean = jnp.asarray(IMAGENET_MEAN, img_01.dtype)
    std = jnp.asarray(IMAGENET_STD, img_01.dtype)
    return (img_01 - mean) / std


def load_vgg_variables(path: str):
    """Load converted VGG weights (.npz from tools/convert_vgg.py) into the
    flax variable structure of :class:`VGG19Features`."""
    data = np.load(path)
    params: dict = {}
    batch_stats: dict = {}
    conv_idx = 0
    bn_idx = 0
    for spec in VGG19_CFG_THROUGH_POOL4:
        if spec == "M":
            continue
        params[f"Conv_{conv_idx}"] = {
            "kernel": jnp.asarray(data[f"conv{conv_idx}_kernel"]),
            "bias": jnp.asarray(data[f"conv{conv_idx}_bias"]),
        }
        params[f"BatchNorm_{bn_idx}"] = {
            "scale": jnp.asarray(data[f"bn{bn_idx}_scale"]),
            "bias": jnp.asarray(data[f"bn{bn_idx}_bias"]),
        }
        batch_stats[f"BatchNorm_{bn_idx}"] = {
            "mean": jnp.asarray(data[f"bn{bn_idx}_mean"]),
            "var": jnp.asarray(data[f"bn{bn_idx}_var"]),
        }
        conv_idx += 1
        bn_idx += 1
    return {"params": params, "batch_stats": batch_stats}


def init_vgg_variables(rng, image_size: int = 64):
    """Random-init VGG variables (tests / no-pretrained fallback)."""
    model = VGG19Features()
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return model.init(rng, dummy)
