"""End-to-end ONE-TRAIN-STEP numerical parity vs the live torch reference.

Identical weights (via the torch bridge) + an identical batch through
one full D-then-G adversarial update in BOTH frameworks, asserting that
every loss scalar, all four updated parameter trees, the BatchNorm
running stats, and the BEGAN k-balance agree to float32 tolerance.

The torch side is a faithful transcription of the reference's per-batch
training body (src/cgan.py:275-360) driven by the reference's own
AdversarialLoss/DataLoss modules (src/loss.py) and torch.optim.Adam —
the exact semantics being claimed: detach placement, the D re-score
after optim_D.step(), the joint G1+G2 / D1+D2 Adam groups, 4 train-mode
D BatchNorm updates per step, and the as-executed ls-flag inversion
("leastsqure" [sic] makes ls always False, so the reference always
optimizes the MSE flavour — our loss_mode="reference" default).

Adam note: both sides run with eps=1e-3 (cfg.adam_eps) instead of 1e-8.
With the default eps, a first Adam step is ~lr*sign(g), so fp-level
gradient noise on near-zero elements flips signs and produces 2*lr
param deltas in BOTH directions — drowning real signal. A large eps
makes the update a smooth function of the gradient, so ANY real
gradient mismatch shows up far above the tolerance. Loss values are
optimizer-independent and compared exactly either way.
"""
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("torch reference not mounted", allow_module_level=True)

sys.path.insert(0, "/root/reference")
# src.loss imports torchvision at module top; VisualLoss is unused here
for _name in ("torchvision", "torchvision.models", "torchvision.transforms"):
    sys.modules.setdefault(_name, types.ModuleType(_name))
sys.modules["torchvision"].models = sys.modules["torchvision.models"]
sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]

from src import networks as rn  # noqa: E402
from src.loss import AdversarialLoss, DataLoss  # noqa: E402

from shadow_removal_istd_tpu.engine import (  # noqa: E402
    TrainConfig,
    build_models,
    init_state,
    make_train_step,
)
from shadow_removal_istd_tpu.engine.state import make_optimizers  # noqa: E402
from shadow_removal_istd_tpu.tools.torch_bridge import (  # noqa: E402
    torch_to_flax_variables,
)

SIZE, B, NGF, NDF = 32, 2, 8, 8
K_INIT = 0.3  # nonzero so the BEGAN k-balance term actually bites

VARIANTS = {
    # name -> (net_d, d_type)
    "default": ("patchgan", "normal"),
    "rel": ("patchgan", "rel"),
    "rel_avg": ("patchgan", "rel_avg"),
    "began": ("began", "normal"),
    "dummy": ("dummy", "normal"),
}


def _tree_maxdiff(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    if not la:
        return 0.0
    return max(float(np.abs(np.asarray(p) - np.asarray(q)).max())
               for p, q in zip(la, lb))


@pytest.mark.slow
@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_one_train_step_matches_reference(variant):
    net_d, d_type = VARIANTS[variant]
    cfg = TrainConfig(net_d=net_d, d_type=d_type, ngf=NGF, ndf=NDF,
                      droprate=0.0, image_size=SIZE, batch_size=B,
                      adam_eps=1e-3, use_visual_loss=False,
                      lambda4=0.0, lambda5=0.0, steps_per_epoch=10 ** 9)

    # ---- identical weights ------------------------------------------
    torch.manual_seed(0)
    tG1 = rn.get_generator("mnet", in_channels=3, out_channels=1, ngf=NGF,
                           drop_rate=0.0, no_conv_t=cfg.nn_upconv,
                           use_selu=False, activation="tanh")
    tG2 = rn.get_generator("mnet", in_channels=4, out_channels=3, ngf=NGF,
                           drop_rate=0.0, no_conv_t=cfg.nn_upconv,
                           use_selu=False, activation="tanh")
    tD1 = rn.get_discriminator(net_d, in_channels=4, out_channels=1,
                               ndf=NDF, use_selu=False, use_sigmoid=False)
    tD2 = rn.get_discriminator(net_d, in_channels=7, out_channels=3,
                               ndf=NDF, use_selu=False, use_sigmoid=False)
    for m in (tG1, tG2, tD1, tD2):
        rn.weights_init(m)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                torch.nn.init.normal_(mod.weight, 1.0, 0.2)
                torch.nn.init.normal_(mod.bias, 0.0, 0.1)

    rng = np.random.default_rng(7)
    x = rng.random((B, SIZE, SIZE, 3), dtype=np.float32) * 2 - 1
    mt = rng.random((B, SIZE, SIZE, 1), dtype=np.float32) * 2 - 1
    y = rng.random((B, SIZE, SIZE, 3), dtype=np.float32) * 2 - 1
    xm = np.concatenate([x, mt], -1)
    xmy = np.concatenate([x, mt, y], -1)

    models = build_models(cfg)
    vg1 = torch_to_flax_variables(tG1, models.g1, x)
    vg2 = torch_to_flax_variables(tG2, models.g2, xm)
    vd1 = torch_to_flax_variables(tD1, models.d1, xm)
    vd2 = torch_to_flax_variables(tD2, models.d2, xmy)

    state = init_state(jax.random.key(0), cfg, models)
    state = state.replace(
        g_params={"g1": vg1["params"], "g2": vg2["params"]},
        d_params={"d1": vd1["params"], "d2": vd2["params"]},
        batch_stats={"g1": vg1.get("batch_stats", {}),
                     "g2": vg2.get("batch_stats", {}),
                     "d1": vd1.get("batch_stats", {}),
                     "d2": vd2.get("batch_stats", {})},
        k1=jnp.asarray(K_INIT), k2=jnp.asarray(K_INIT))
    tx_g, tx_d = make_optimizers(cfg)
    state = state.replace(opt_g=tx_g.init(state.g_params),
                          opt_d=tx_d.init(state.d_params))

    # ---- our jitted step --------------------------------------------
    with jax.default_matmul_precision("highest"):
        step = make_train_step(models, cfg)
        new_state, metrics = jax.device_get(step(
            state, (jnp.asarray(x), jnp.asarray(mt), jnp.asarray(y)),
            jax.random.key(1)))

    # ---- torch reference step (src/cgan.py:275-360) ------------------
    optim_G = torch.optim.Adam(
        list(tG1.parameters()) + list(tG2.parameters()),
        lr=cfg.lr_g, betas=(cfg.beta1, cfg.beta2), eps=cfg.adam_eps)
    optim_D = torch.optim.Adam(
        list(tD1.parameters()) + list(tD2.parameters()),
        lr=cfg.lr_d, betas=(cfg.beta1, cfg.beta2), eps=cfg.adam_eps)
    adv_loss = AdversarialLoss(ls=(cfg.d_loss_fn == "leastsqure"),  # [sic]
                               rel=("rel" in d_type), avg=("avg" in d_type))
    data_loss = DataLoss()
    began = cfg.began
    k1 = k2 = K_INIT
    gamma, lambda_k = 0.7, 0.001  # src/cgan.py:171-172

    for m in (tG1, tG2, tD1, tD2):
        m.train()
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    tm = torch.tensor(mt).permute(0, 3, 1, 2)
    ty = torch.tensor(y).permute(0, 3, 1, 2)

    optim_D.zero_grad()
    optim_G.zero_grad()
    C1_real = tD1(torch.cat((tx, tm), dim=1))
    m_pred = tG1(tx)
    C1_fake = tD1(torch.cat((tx, m_pred.detach()), dim=1))
    C2_real = tD2(torch.cat((tx, tm, ty), dim=1))
    y_pred = tG2(torch.cat((tx, m_pred), dim=1))
    C2_fake = tD2(torch.cat((tx, m_pred.detach(), y_pred.detach()), dim=1))
    if began:
        D1_loss_real = data_loss(C1_real, tm.detach())
        D1_loss_fake = data_loss(C1_fake, m_pred.detach())
        D1_loss = D1_loss_real - k1 * D1_loss_fake
        D2_loss_real = data_loss(C2_real, ty.detach())
        D2_loss_fake = data_loss(C2_fake, y_pred.detach())
        D2_loss = D2_loss_real - k2 * D2_loss_fake
    else:
        D1_loss = adv_loss(C1_real, C1_fake, D_loss=True)
        D2_loss = adv_loss(C2_real, C2_fake, D_loss=True)
    D_loss = cfg.lambda2 * D1_loss + cfg.lambda3 * D2_loss
    D_loss.backward()
    optim_D.step()

    optim_G.zero_grad()
    tD1.requires_grad_(False)
    tD2.requires_grad_(False)
    C1_real = tD1(torch.cat((tx, tm), dim=1))
    C1_fake = tD1(torch.cat((tx, m_pred), dim=1))
    C2_real = tD2(torch.cat((tx, tm, ty), dim=1))
    C2_fake = tD2(torch.cat((tx, m_pred, y_pred), dim=1))
    if began:
        G1_loss = data_loss(C1_fake, m_pred.detach())
        G2_loss = data_loss(C2_fake, y_pred.detach())
    else:
        G1_loss = adv_loss(C1_real, C1_fake, D_loss=False)
        G2_loss = adv_loss(C2_real, C2_fake, D_loss=False)
    data1_loss = data_loss(m_pred, tm)
    data2_loss = data_loss(y_pred, ty)
    G_loss = (data1_loss + cfg.lambda1 * data2_loss +
              cfg.lambda2 * G1_loss + cfg.lambda3 * G2_loss)
    G_loss.backward()
    optim_G.step()
    if began:
        k1 = float(np.clip(
            k1 + lambda_k * (gamma * D1_loss_real.item()
                             - D1_loss_fake.item()), 0, 1))
        k2 = float(np.clip(
            k2 + lambda_k * (gamma * D2_loss_real.item()
                             - D2_loss_fake.item()), 0, 1))

    # ---- compare ------------------------------------------------------
    for name, t in [("D1", D1_loss), ("D2", D2_loss), ("D", D_loss),
                    ("G1", G1_loss), ("G2", G2_loss),
                    ("data1", data1_loss), ("data2", data2_loss),
                    ("G", G_loss)]:
        tv = t.detach().item()  # .item() on detached: no autograd warning
        assert abs(tv - float(metrics[name])) < 2e-5, \
            f"{variant}/{name}: torch {tv} vs {float(metrics[name])}"

    uvg1 = torch_to_flax_variables(tG1, models.g1, x)
    uvg2 = torch_to_flax_variables(tG2, models.g2, xm)
    uvd1 = torch_to_flax_variables(tD1, models.d1, xm)
    uvd2 = torch_to_flax_variables(tD2, models.d2, xmy)
    # a real gradient-path bug produces O(lr)=5e-4..1e-3 deltas here
    # (the MNet skip-link fix did); fp noise through the smoothed Adam
    # stays ~1e-4
    assert _tree_maxdiff(uvg1["params"], new_state.g_params["g1"]) < 3e-4
    assert _tree_maxdiff(uvg2["params"], new_state.g_params["g2"]) < 3e-4
    assert _tree_maxdiff(uvd1["params"], new_state.d_params["d1"]) < 3e-4
    assert _tree_maxdiff(uvd2["params"], new_state.d_params["d2"]) < 3e-4
    for net, upd in [("g1", uvg1), ("g2", uvg2), ("d1", uvd1), ("d2", uvd2)]:
        assert _tree_maxdiff(upd.get("batch_stats", {}),
                             new_state.batch_stats[net]) < 1e-5

    if began:
        assert abs(float(new_state.k1) - k1) < 1e-6
        assert abs(float(new_state.k2) - k2) < 1e-6
