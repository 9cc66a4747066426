"""Feature-level parity of the VGG-19-BN perceptual-loss extractor.

torchvision isn't installed here, so the oracle is a VGG-19-BN
``features[:40]`` stack built from plain torch primitives with EXACTLY
torchvision's module layout (cfg "E" conv/BN/ReLU triplets + max pools —
so its ``state_dict`` keys are identical to torchvision's
``vgg19_bn().features.state_dict()``). Random weights + random running
stats flow through the real conversion path
(tools/convert_vgg.convert_state_dict -> npz ->
models/vgg.load_vgg_variables), validating the converter layout, the
flax extractor graph, and the full visual-loss value end to end against
the reference math (src/loss.py:29-56).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from shadow_removal_istd_tpu.losses import visual_loss  # noqa: E402
from shadow_removal_istd_tpu.models.vgg import (  # noqa: E402
    VGG19Features,
    load_vgg_variables,
)
from shadow_removal_istd_tpu.tools.convert_vgg import (  # noqa: E402
    convert_state_dict,
)

# torchvision vgg19_bn cfg "E"; features[:40] stops after pool4
_CFG_E_THROUGH_POOL4 = [64, 64, "M", 128, 128, "M",
                        256, 256, 256, 256, "M", 512, 512, 512, 512, "M"]


def build_torch_vgg19_bn_features():
    """torchvision-layout vgg19_bn().features[:40] from torch primitives."""
    layers = []
    in_ch = 3
    for spec in _CFG_E_THROUGH_POOL4:
        if spec == "M":
            layers.append(torch.nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(torch.nn.Conv2d(in_ch, spec, 3, padding=1))
            layers.append(torch.nn.BatchNorm2d(spec))
            layers.append(torch.nn.ReLU(inplace=True))
            in_ch = spec
    seq = torch.nn.Sequential(*layers)
    assert len(seq) == 40  # features[:40] == through pool4
    return seq


def _randomize(vgg, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for m in vgg.modules():
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.init.normal_(m.weight, 0.0, 0.05)
                torch.nn.init.normal_(m.bias, 0.0, 0.05)
            elif isinstance(m, torch.nn.BatchNorm2d):
                torch.nn.init.normal_(m.weight, 1.0, 0.1)
                torch.nn.init.normal_(m.bias, 0.0, 0.1)
                torch.nn.init.normal_(m.running_mean, 0.0, 0.1)
                m.running_var.copy_(
                    torch.rand_like(m.running_var) * 0.5 + 0.75)
    return vgg


@pytest.fixture(scope="module")
def shared_weights(tmp_path_factory):
    vgg = _randomize(build_torch_vgg19_bn_features())
    npz_path = tmp_path_factory.mktemp("vgg") / "vgg19_bn_rand.npz"
    np.savez(npz_path, **convert_state_dict(vgg.state_dict()))
    return vgg, load_vgg_variables(str(npz_path))


def test_state_dict_keys_match_torchvision_layout(shared_weights):
    vgg, _ = shared_weights
    keys = set(vgg.state_dict().keys())
    # spot-check the torchvision indices the converter hardcodes
    for ci, bi in [(0, 1), (3, 4), (7, 8), (36, 37)]:
        assert f"{ci}.weight" in keys and f"{ci}.bias" in keys
        assert f"{bi}.running_mean" in keys and f"{bi}.running_var" in keys


def test_feature_map_parity(shared_weights):
    vgg, flax_vars = shared_weights
    x01 = np.random.default_rng(3).random((2, 32, 32, 3)).astype(np.float32)
    vgg.eval()
    with torch.no_grad():
        tf = vgg(torch.tensor(x01).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    with jax.default_matmul_precision("highest"):
        ff = VGG19Features().apply(flax_vars, jnp.asarray(x01))
    assert ff.shape == tuple(tf.shape)
    # random (unpretrained) weights inflate activations to O(100), so
    # compare at fp32 accumulation tolerance relative to that scale
    scale = float(np.abs(tf.numpy()).max())
    np.testing.assert_allclose(np.asarray(ff), tf.numpy(),
                               atol=5e-6 * max(scale, 1.0))


def test_visual_loss_value_parity(shared_weights):
    """Full loss vs the reference VisualLoss.forward math
    (src/loss.py:45-56): x*0.5+0.5, ImageNet normalize, MSE(features)."""
    vgg, flax_vars = shared_weights
    rng = np.random.default_rng(4)
    pred = (rng.random((2, 32, 32, 3), dtype=np.float32) * 2 - 1)
    target = (rng.random((2, 32, 32, 3), dtype=np.float32) * 2 - 1)

    vgg.eval()
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        tp = (torch.tensor(pred).permute(0, 3, 1, 2) * 0.5 + 0.5 - mean) / std
        tt = (torch.tensor(target).permute(0, 3, 1, 2) * 0.5 + 0.5
              - mean) / std
        t_loss = torch.nn.functional.mse_loss(vgg(tp), vgg(tt))

    with jax.default_matmul_precision("highest"):
        f_loss = visual_loss(flax_vars, jnp.asarray(pred),
                             jnp.asarray(target))
    assert abs(float(f_loss) - float(t_loss)) < 1e-5 * max(
        1.0, abs(float(t_loss)))


def test_single_channel_matte_broadcast(shared_weights):
    """1-channel inputs broadcast to 3 like the reference's expand()
    (src/cgan.py:334-335): the 1-channel loss must EQUAL the loss on
    explicitly channel-tiled inputs with pred != target (loss(m, m)==0
    holds for any deterministic channel handling and pins nothing)."""
    _, flax_vars = shared_weights
    rng = np.random.default_rng(5)
    m = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32) * 2 - 1)
    t = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32) * 2 - 1)
    with jax.default_matmul_precision("highest"):
        one_ch = visual_loss(flax_vars, m, t)
        tiled = visual_loss(flax_vars, jnp.repeat(m, 3, axis=-1),
                            jnp.repeat(t, 3, axis=-1))
    assert float(one_ch) > 0
    np.testing.assert_allclose(float(one_ch), float(tiled), rtol=1e-6)


def test_sp_visual_loss_parity(shared_weights):
    """Legacy sp-space VisualLoss vs a transcription of the reference
    forward (STCGAN/loss.py:49-56): denormalize input with ISTD stats,
    sp*input clamped [0,1], VGG feature MSE — no ImageNet normalize."""
    from shadow_removal_istd_tpu.losses import sp_visual_loss

    vgg, flax_vars = shared_weights
    rng = np.random.default_rng(6)
    x_norm = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    sp = (rng.random((2, 32, 32, 3), dtype=np.float32) * 3.0)
    target01 = rng.random((2, 32, 32, 3), dtype=np.float32)

    vgg.eval()
    mean = torch.tensor([0.54, 0.57, 0.57]).reshape(3, 1, 1)
    std = torch.tensor([0.14, 0.14, 0.14]).reshape(3, 1, 1)
    with torch.no_grad():
        tx = torch.tensor(x_norm).permute(0, 3, 1, 2)
        tsp = torch.tensor(sp).permute(0, 3, 1, 2)
        tt = torch.tensor(target01).permute(0, 3, 1, 2)
        img_in = tx.mul(std).add(mean)
        img_pred = tsp.mul(img_in).clamp_(0, 1)
        t_loss = torch.nn.functional.mse_loss(vgg(img_pred), vgg(tt))

    with jax.default_matmul_precision("highest"):
        f_loss = sp_visual_loss(flax_vars, jnp.asarray(x_norm),
                                jnp.asarray(sp), jnp.asarray(target01))
    assert abs(float(f_loss) - float(t_loss)) < 1e-5 * max(
        1.0, abs(float(t_loss)))
