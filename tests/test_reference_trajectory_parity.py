"""Multi-STEP training-TRAJECTORY parity vs the live torch reference.

tests/test_reference_step_parity.py proves ONE D-then-G step matches.
This file proves the *composition* matches: N steps across >=2 epoch
boundaries from identical bridged weights with an identical batch
sequence, so that

- Adam moment evolution (m/v accumulation over steps),
- BatchNorm running-stat accumulation across steps and epochs,
- the per-epoch ExponentialLR decay (reference src/cgan.py:91-94,
  382-384: gamma = 1 - decay, stepped once per epoch) landing on the
  same epochs with the same factor, and
- the legacy plateau scheduler's composition with summed epoch losses
  (reference STCGAN/stcgan.py:66-71, 315-317)

are all tested rather than extrapolated from single-step parity.

The primary harness runs BOTH frameworks in float64 (torch ``.double()``
/ ``jax.experimental.enable_x64``): with fp noise pushed to 1e-16, any
*systematic* divergence — schedule off-by-one, loss-scale drift, BN
momentum mismatch — would dominate the envelope immediately. Measured
drift over 12 steps x 3 epochs is <=2e-10 at eps=1e-3 and <=7e-10 at
the reference's TRUE Adam eps=1e-8 (tolerances below carry ~100x
headroom). Building this harness caught two real accumulation-dtype
issues (BatchNorm statistics and loss reductions hard-cast to f32),
now fixed via promote_types so f64 flows end-to-end.

A float32 trajectory at production dtype is also exercised with a
relative envelope: fp32 sign-noise through the GAN compounds ~3x/step
(params differ O(3e-4) after one step — see the step-parity file's
Adam note), so pointwise f32 bounds beyond a few percent are
meaningless; the f64 runs are the precision claim.
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
from shadow_removal_istd_tpu.engine.schedules import (  # noqa: E402
    ReduceLROnPlateau,
)
from shadow_removal_istd_tpu.engine.state import make_optimizers  # noqa: E402
from shadow_removal_istd_tpu.tools.torch_bridge import (  # noqa: E402
    torch_to_flax_variables,
)

SIZE, B, NGF, NDF = 32, 2, 8, 8
STEPS_PER_EPOCH = 4
DECAY = 0.05  # large so a misaligned decay epoch is far above tolerance
LOSS_KEYS = ("D", "G", "data1", "data2")


def _tree_maxdiff(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    return max(float(np.abs(np.asarray(p) - np.asarray(q)).max())
               for p, q in zip(la, lb))


def _make_torch_nets(cfg):
    torch.manual_seed(0)
    tG1 = rn.get_generator("mnet", in_channels=3, out_channels=1, ngf=NGF,
                           drop_rate=0.0, no_conv_t=cfg.nn_upconv,
                           use_selu=False, activation="tanh")
    tG2 = rn.get_generator("mnet", in_channels=4, out_channels=3, ngf=NGF,
                           drop_rate=0.0, no_conv_t=cfg.nn_upconv,
                           use_selu=False, activation="tanh")
    tD1 = rn.get_discriminator(cfg.net_d, in_channels=4, out_channels=1,
                               ndf=NDF, use_selu=False, use_sigmoid=False)
    tD2 = rn.get_discriminator(cfg.net_d, in_channels=7, out_channels=3,
                               ndf=NDF, use_selu=False, use_sigmoid=False)
    for m in (tG1, tG2, tD1, tD2):
        rn.weights_init(m)
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                torch.nn.init.normal_(mod.weight, 1.0, 0.2)
                torch.nn.init.normal_(mod.bias, 0.0, 0.1)
        m.train()
    return tG1, tG2, tD1, tD2


def _make_batches(n_steps, np_dtype):
    rng = np.random.default_rng(7)
    batches = []
    for _ in range(n_steps):
        x = rng.random((B, SIZE, SIZE, 3), dtype=np.float32) * 2 - 1
        mt = rng.random((B, SIZE, SIZE, 1), dtype=np.float32) * 2 - 1
        y = rng.random((B, SIZE, SIZE, 3), dtype=np.float32) * 2 - 1
        batches.append(tuple(a.astype(np_dtype) for a in (x, mt, y)))
    return batches


def _torch_step(nets, optims, adv_loss, data_loss, cfg, batch,
                kstate=None):
    """One reference training batch (src/cgan.py:275-360); ``kstate``
    is the mutable BEGAN k-balance dict {"k1","k2"} (src/cgan.py:
    290-297, 352-360) when cfg.began."""
    tG1, tG2, tD1, tD2 = nets
    optim_G, optim_D = optims
    x, mt, y = batch
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    tm = torch.tensor(mt).permute(0, 3, 1, 2)
    ty = torch.tensor(y).permute(0, 3, 1, 2)

    tD1.requires_grad_(True)
    tD2.requires_grad_(True)
    optim_D.zero_grad()
    optim_G.zero_grad()
    C1_real = tD1(torch.cat((tx, tm), dim=1))
    m_pred = tG1(tx)
    C1_fake = tD1(torch.cat((tx, m_pred.detach()), dim=1))
    C2_real = tD2(torch.cat((tx, tm, ty), dim=1))
    y_pred = tG2(torch.cat((tx, m_pred), dim=1))
    C2_fake = tD2(torch.cat((tx, m_pred.detach(), y_pred.detach()), dim=1))
    if cfg.began:
        D1_real = data_loss(C1_real, tm.detach())
        D1_fake = data_loss(C1_fake, m_pred.detach())
        D1_loss = D1_real - kstate["k1"] * D1_fake
        D2_real = data_loss(C2_real, ty.detach())
        D2_fake = data_loss(C2_fake, y_pred.detach())
        D2_loss = D2_real - kstate["k2"] * D2_fake
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
    if cfg.began:
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
    if cfg.began:
        gamma, lambda_k = 0.7, 0.001  # src/cgan.py:171-172
        kstate["k1"] = float(np.clip(
            kstate["k1"] + lambda_k * (gamma * D1_real.detach().item()
                                       - D1_fake.detach().item()), 0, 1))
        kstate["k2"] = float(np.clip(
            kstate["k2"] + lambda_k * (gamma * D2_real.detach().item()
                                       - D2_fake.detach().item()), 0, 1))
    return {"D": D_loss.detach().item(), "G": G_loss.detach().item(),
            "data1": data1_loss.detach().item(),
            "data2": data2_loss.detach().item()}


K_INIT = 0.3  # nonzero so the BEGAN balance term bites from step 0


def _run_trajectories(adam_eps, n_epochs, lr_schedule="exponential",
                      plateau_kw=None, x64=True,
                      net_d="patchgan", d_type="normal"):
    """Run both frameworks over the same batch sequence.

    Returns (per-step torch losses, per-step jax losses, per-epoch
    torch G lrs, per-epoch jax G lrs, final torch nets, final jax
    state, models, batches). In x64 mode the torch nets run double and
    the jax side under enable_x64 with f64 params/batches.
    """
    np_dtype = np.float64 if x64 else np.float32
    cfg = TrainConfig(net_d=net_d, d_type=d_type, ngf=NGF, ndf=NDF,
                      droprate=0.0, image_size=SIZE, batch_size=B,
                      adam_eps=adam_eps, use_visual_loss=False,
                      lambda4=0.0, lambda5=0.0, decay=DECAY,
                      lr_schedule=lr_schedule,
                      steps_per_epoch=STEPS_PER_EPOCH)
    n_steps = n_epochs * STEPS_PER_EPOCH
    batches = _make_batches(n_steps, np_dtype)

    # ---- torch side -------------------------------------------------
    nets = _make_torch_nets(cfg)
    if x64:
        for m in nets:
            m.double()
    tG1, tG2, tD1, tD2 = nets
    optim_G = torch.optim.Adam(
        list(tG1.parameters()) + list(tG2.parameters()),
        lr=cfg.lr_g, betas=(cfg.beta1, cfg.beta2), eps=cfg.adam_eps)
    optim_D = torch.optim.Adam(
        list(tD1.parameters()) + list(tD2.parameters()),
        lr=cfg.lr_d, betas=(cfg.beta1, cfg.beta2), eps=cfg.adam_eps)
    if lr_schedule == "exponential":
        # reference src/cgan.py:91-94: ExponentialLR(gamma=1-decay)
        sched_G = torch.optim.lr_scheduler.ExponentialLR(
            optim_G, gamma=1.0 - cfg.decay)
        sched_D = torch.optim.lr_scheduler.ExponentialLR(
            optim_D, gamma=1.0 - cfg.decay)
    else:
        # legacy STCGAN/stcgan.py:66-71 semantics, shortened patience
        # so a reduction actually fires inside the test horizon
        sched_G = torch.optim.lr_scheduler.ReduceLROnPlateau(
            optim_G, mode="min", **plateau_kw)
        sched_D = torch.optim.lr_scheduler.ReduceLROnPlateau(
            optim_D, mode="min", **plateau_kw)
    adv = AdversarialLoss(ls=(cfg.d_loss_fn == "leastsqure"),  # [sic]
                          rel=("rel" in d_type), avg=("avg" in d_type))
    dl = DataLoss()
    kstate = {"k1": K_INIT, "k2": K_INIT} if cfg.began else None

    # ---- jax side ---------------------------------------------------
    x0, mt0, y0 = batches[0]
    xm0 = np.concatenate([x0, mt0], -1)
    xmy0 = np.concatenate([x0, mt0, y0], -1)
    models = build_models(cfg)
    # bridge from the UNSTEPPED torch nets (we haven't run them yet);
    # double weights stay f64 through the bridge
    vg1 = torch_to_flax_variables(tG1, models.g1, x0)
    vg2 = torch_to_flax_variables(tG2, models.g2, xm0)
    vd1 = torch_to_flax_variables(tD1, models.d1, xm0)
    vd2 = torch_to_flax_variables(tD2, models.d2, xmy0)
    state = init_state(jax.random.key(0), cfg, models)
    kdt = jnp.float64 if x64 else jnp.float32
    state = state.replace(
        g_params={"g1": vg1["params"], "g2": vg2["params"]},
        d_params={"d1": vd1["params"], "d2": vd2["params"]},
        batch_stats={"g1": vg1.get("batch_stats", {}),
                     "g2": vg2.get("batch_stats", {}),
                     "d1": vd1.get("batch_stats", {}),
                     "d2": vd2.get("batch_stats", {})},
        k1=jnp.asarray(K_INIT, kdt), k2=jnp.asarray(K_INIT, kdt))
    tx_g, tx_d = make_optimizers(cfg)
    state = state.replace(opt_g=tx_g.init(state.g_params),
                          opt_d=tx_d.init(state.d_params))

    j_plat_g = j_plat_d = None
    if lr_schedule == "plateau":
        j_plat_g = ReduceLROnPlateau(cfg.lr_g, **plateau_kw)
        j_plat_d = ReduceLROnPlateau(cfg.lr_d, **plateau_kw)

    torch_losses, jax_losses = [], []
    torch_lrs, jax_lrs = [], []
    with jax.default_matmul_precision("highest"):
        step = make_train_step(models, cfg)
        for epoch in range(n_epochs):
            t_epoch_G = t_epoch_D = 0.0
            j_epoch_G = j_epoch_D = 0.0
            scale_g = j_plat_g.scale if j_plat_g else 1.0
            scale_d = j_plat_d.scale if j_plat_d else 1.0
            for s in range(STEPS_PER_EPOCH):
                batch = batches[epoch * STEPS_PER_EPOCH + s]
                tm = _torch_step(nets, (optim_G, optim_D), adv, dl, cfg,
                                 batch, kstate)
                torch_losses.append(tm)
                t_epoch_G += tm["G"]
                t_epoch_D += tm["D"]
                state, metrics = step(
                    state, tuple(jnp.asarray(a) for a in batch),
                    jax.random.key(epoch * 100 + s), scale_g, scale_d)
                metrics = jax.device_get(metrics)
                jm = {k: float(metrics[k]) for k in LOSS_KEYS}
                jax_losses.append(jm)
                j_epoch_G += jm["G"]
                j_epoch_D += jm["D"]
            torch_lrs.append(optim_G.param_groups[0]["lr"])
            if lr_schedule == "exponential":
                # my schedule is a pure fn of the optax step count
                # (engine/state.py make_optimizers): this epoch's lr
                jax_lrs.append(cfg.lr_g * (1.0 - cfg.decay) ** epoch)
                sched_G.step()
                sched_D.step()
            else:
                # legacy: scheduler steps on the SUMMED epoch losses
                # (STCGAN/stcgan.py:315-317)
                jax_lrs.append(j_plat_g.current_lr)
                sched_G.step(t_epoch_G)
                sched_D.step(t_epoch_D)
                j_plat_g.step(j_epoch_G)
                j_plat_d.step(j_epoch_D)
    return (torch_losses, jax_losses, torch_lrs, jax_lrs, nets, state,
            models, batches, kstate)


import contextlib


@contextlib.contextmanager
def enable_x64():
    """jax 0.9 dropped jax.experimental.enable_x64; flip the config
    flag with a guaranteed restore so other test modules stay f32."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", old)


def _assert_lrs_equal(t_lrs, j_lrs):
    for e, (tl, jl) in enumerate(zip(t_lrs, j_lrs)):
        assert abs(tl - jl) < 1e-12, f"epoch {e}: torch lr {tl} vs {jl}"


@pytest.mark.slow
def test_trajectory_parity_f64():
    """12 steps / 3 epochs, both frameworks in float64 at smoothed Adam
    eps=1e-3: pointwise per-step loss parity at 1e-8 (measured drift
    <=2e-10), exact decay-epoch alignment, and final params + BN
    running stats matching after two lr changes."""
    n_epochs = 3
    with enable_x64():
        (t_losses, j_losses, t_lrs, j_lrs, nets, state, models,
         batches, _) = _run_trajectories(1e-3, n_epochs)

        _assert_lrs_equal(t_lrs, j_lrs)
        assert abs(t_lrs[0] - 5e-4) < 1e-12
        assert abs(t_lrs[-1] - 5e-4 * (1 - DECAY) ** (n_epochs - 1)) < 1e-12

        for t, (tm, jm) in enumerate(zip(t_losses, j_losses)):
            for k in LOSS_KEYS:
                assert abs(tm[k] - jm[k]) < 1e-8, \
                    f"step {t} {k}: torch {tm[k]} vs jax {jm[k]}"

        # final parameters after 12 updates: bridged-back comparison
        x0, mt0, y0 = batches[0]
        xm0 = np.concatenate([x0, mt0], -1)
        xmy0 = np.concatenate([x0, mt0, y0], -1)
        tG1, tG2, tD1, tD2 = nets
        uvg1 = torch_to_flax_variables(tG1, models.g1, x0)
        uvg2 = torch_to_flax_variables(tG2, models.g2, xm0)
        uvd1 = torch_to_flax_variables(tD1, models.d1, xm0)
        uvd2 = torch_to_flax_variables(tD2, models.d2, xmy0)
        assert _tree_maxdiff(uvg1["params"], state.g_params["g1"]) < 1e-8
        assert _tree_maxdiff(uvg2["params"], state.g_params["g2"]) < 1e-8
        assert _tree_maxdiff(uvd1["params"], state.d_params["d1"]) < 1e-8
        assert _tree_maxdiff(uvd2["params"], state.d_params["d2"]) < 1e-8
        # BN running stats accumulated over 12 steps x 4 D forwards
        for net, upd in [("g1", uvg1), ("g2", uvg2), ("d1", uvd1),
                         ("d2", uvd2)]:
            assert _tree_maxdiff(upd.get("batch_stats", {}),
                                 state.batch_stats[net]) < 1e-8


@pytest.mark.slow
def test_trajectory_parity_true_adam_eps_f64():
    """Same trajectory at the reference's TRUE Adam eps=1e-8 in f64:
    still pointwise (measured drift <=7e-10 over 12 steps). At f32 this
    regime is sign-noise chaotic (update ~ lr*sign(g) for near-zero
    second moments); f64 keeps gradients matched to ~1e-13 so no
    knife-edge flips occur and the trajectories stay locked."""
    with enable_x64():
        (t_losses, j_losses, t_lrs, j_lrs, *_) = _run_trajectories(
            1e-8, 3)
        _assert_lrs_equal(t_lrs, j_lrs)
        for t, (tm, jm) in enumerate(zip(t_losses, j_losses)):
            for k in LOSS_KEYS:
                assert abs(tm[k] - jm[k]) < 1e-7, \
                    f"step {t} {k}: torch {tm[k]} vs jax {jm[k]}"


@pytest.mark.slow
def test_trajectory_parity_f32_envelope():
    """Production-dtype (f32) trajectory at smoothed eps: relative
    envelope only — fp32 noise through a GAN compounds ~3x/step, so
    the curves can part by O(1%) by step 12 without any systematic
    bug (the f64 tests above pin the systematic part to ~1e-10)."""
    (t_losses, j_losses, t_lrs, j_lrs, *_) = _run_trajectories(
        1e-3, 3, x64=False)
    _assert_lrs_equal(t_lrs, j_lrs)
    for t, (tm, jm) in enumerate(zip(t_losses, j_losses)):
        for k in LOSS_KEYS:
            tol = 0.05 * max(abs(tm[k]), 1.0)
            assert abs(tm[k] - jm[k]) < tol, \
                f"step {t} {k}: torch {tm[k]} vs jax {jm[k]} (tol {tol})"
    # (no "loss decreases" check: batches are i.i.d. noise, so there is
    # nothing to learn in 12 steps — benchmarks/overfit_real_sample.py
    # is the real-data learning evidence)


@pytest.mark.slow
def test_trajectory_parity_plateau_schedule():
    """Legacy plateau path composed over epochs in f64: both sides feed
    their own SUMMED epoch losses (STCGAN/stcgan.py:315-317) to their
    own torch-semantics controller; the lr trajectories must be
    identical epoch-by-epoch, including at least one actual reduction,
    and the loss curves stay pointwise-locked through it."""
    # threshold=0.3 rel: an epoch only counts as improved if the
    # summed loss drops >30% — guarantees bad epochs (and therefore
    # reductions) fire on a mildly-improving GAN inside 5 epochs;
    # cooldown=1 exercises the cooldown-suppression branch too
    plateau_kw = dict(factor=0.8, patience=0, threshold=0.3, cooldown=1,
                      min_lr=1e-7)
    with enable_x64():
        (t_losses, j_losses, t_lrs, j_lrs, *_) = _run_trajectories(
            1e-3, 5, lr_schedule="plateau", plateau_kw=plateau_kw)
        _assert_lrs_equal(t_lrs, j_lrs)
        # with patience=0 over 5 GAN epochs a reduction must have
        # fired — otherwise this test is vacuous
        assert t_lrs[-1] < t_lrs[0]
        for t, (tm, jm) in enumerate(zip(t_losses, j_losses)):
            for k in ("D", "G"):
                assert abs(tm[k] - jm[k]) < 1e-7, \
                    f"step {t} {k}: {tm[k]} vs {jm[k]}"


@pytest.mark.slow
@pytest.mark.parametrize("d_type", ["rel", "rel_avg"])
def test_trajectory_parity_relativistic_variants_f64(d_type):
    """The relativistic and relativistic-average adversarial flavours
    (reference src/loss.py:59-112) composed over 2 epochs in f64 —
    single-step parity for these variants exists; this pins their
    multi-step composition (the D-then-G interleaving feeds back
    differently when losses couple real and fake scores)."""
    with enable_x64():
        (t_losses, j_losses, t_lrs, j_lrs, *_) = _run_trajectories(
            1e-3, 2, d_type=d_type)
        _assert_lrs_equal(t_lrs, j_lrs)
        for t, (tm, jm) in enumerate(zip(t_losses, j_losses)):
            for k in LOSS_KEYS:
                assert abs(tm[k] - jm[k]) < 1e-8, \
                    f"{d_type} step {t} {k}: {tm[k]} vs {jm[k]}"


@pytest.mark.slow
def test_trajectory_parity_began_k_evolution_f64():
    """BEGAN k-balance is per-step mutable state (src/cgan.py:290-297,
    352-360): k_t feeds D-loss_t which feeds k_{t+1}. One-step parity
    cannot see a drifting k recurrence; 2 epochs in f64 locks the whole
    k trajectory (via the loss curves it multiplies into) and the final
    k values."""
    with enable_x64():
        (t_losses, j_losses, t_lrs, j_lrs, nets, state, models,
         batches, kstate) = _run_trajectories(1e-3, 2, net_d="began")
        _assert_lrs_equal(t_lrs, j_lrs)
        for t, (tm, jm) in enumerate(zip(t_losses, j_losses)):
            for k in LOSS_KEYS:
                assert abs(tm[k] - jm[k]) < 1e-8, \
                    f"began step {t} {k}: {tm[k]} vs {jm[k]}"
        assert abs(float(state.k1) - kstate["k1"]) < 1e-10
        assert abs(float(state.k2) - kstate["k2"]) < 1e-10
        # the recurrence actually moved k (test isn't vacuous)
        assert abs(kstate["k1"] - 0.3) > 1e-6
