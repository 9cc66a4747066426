"""Jitted train / eval / infer steps — the heart of the engine.

One ``train_step(state, batch, rng) -> (state, metrics)`` expresses the
reference's per-batch loop (src/cgan.py:265-380) as a single compiled
function:

- D phase: forward G1/G2 once, score D1 on (x,m) vs (x, sg(m_pred)) and
  D2 on (x,m,y) vs (x, sg(m_pred), sg(y_pred)) — ``lax.stop_gradient``
  where the reference calls ``.detach()`` — then Adam-update D1+D2
  jointly (src/cgan.py:281-305).
- G phase: re-score the *updated* discriminators on non-detached
  predictions (the reference re-runs D after optim_D.step,
  src/cgan.py:320-324) and Adam-update G1+G2 against
  data1 + l1*data2 + l2*G1adv + l3*G2adv + l4*vis1 + l5*vis2
  (src/cgan.py:343-351).
- BEGAN mode swaps the adversarial terms for reconstruction losses with
  k-balance control (src/cgan.py:290-297, 352-360).

BatchNorm running stats are threaded through the same sequence of
forwards as the reference executes (D sees 4 train-mode forwards per
step, G sees 1 — the D-phase G forward reuses the same dropout keys so
both phases see identical predictions).

Everything static (models, config, loss flavour) is closed over; the
returned functions are pure and jittable, and under a sharded batch the
GSPMD partitioner turns them into the data-parallel step (psum'd grads,
global-batch BN) with no code changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from shadow_removal_istd_tpu.engine.config import TrainConfig
from shadow_removal_istd_tpu.engine.state import (
    Models,
    TrainState,
    make_optimizers,
)
from shadow_removal_istd_tpu.losses import (
    began_k_update,
    l1_loss,
    make_adversarial_loss,
    visual_loss,
)


def _apply(model, params, stats, x, *, train: bool, rng=None):
    """Apply a model, returning (output, new_batch_stats)."""
    variables: dict = {"params": params}
    has_stats = bool(stats)
    if has_stats:
        variables["batch_stats"] = stats
    rngs = {"dropout": rng} if rng is not None else None
    if train:
        out, updates = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"], rngs=rngs)
        return out, updates.get("batch_stats", stats)
    out = model.apply(variables, x, train=False, rngs=rngs)
    return out, stats


def _cat(*tensors):
    return jnp.concatenate(tensors, axis=-1)


def make_train_step(models: Models, cfg: TrainConfig, vgg_vars=None):
    """Build the jitted training step."""
    return jax.jit(_unjitted_train_step(models, cfg, vgg_vars),
                   donate_argnums=(0,))


def _make_vis_fns(cfg: TrainConfig, vgg_vars):
    """Per-term perceptual-loss closures: (vis1 for lambda4, vis2 for
    lambda5). Gated INDIVIDUALLY — zeroing one lambda must not keep
    paying that term's two VGG-19 forwards per step for a value that is
    then multiplied by zero (reference runs both unconditionally,
    src/cgan.py:334-340; same numbers, none of the waste)."""
    base = cfg.use_visual_loss and vgg_vars is not None

    def make(lam):
        if base and lam != 0:
            return lambda pred, target: visual_loss(vgg_vars, pred,
                                                    target)
        return lambda pred, target: jnp.zeros(())

    return make(cfg.lambda4), make(cfg.lambda5)


def _unjitted_train_step(models: Models, cfg: TrainConfig, vgg_vars=None):
    """The raw (unjitted) step — also scanned over by engine/epoch.py."""
    adv = make_adversarial_loss(cfg.d_loss_fn, cfg.d_type, cfg.loss_mode)
    tx_g, tx_d = make_optimizers(cfg)
    _vis1, _vis2 = _make_vis_fns(cfg, vgg_vars)

    def train_step(state: TrainState, batch, rng,
                   lr_scale_g=1.0, lr_scale_d=1.0):
        """lr_scale_{g,d} multiply the Adam updates — the hook for the
        host-side ReduceLROnPlateau controller (legacy schedule)."""
        x, m, y = batch
        kg1, kg2 = jax.random.split(rng)

        # ---- G forward EXACTLY ONCE, linearized via jax.vjp — like the
        # reference's single forward whose graph serves both phases
        # (src/cgan.py:282-286). The D phase consumes the primal outputs
        # as constants; the G phase pulls its gradient back through the
        # saved linearization instead of re-running the forward.
        def g_forward(g_params):
            m_pred, s_g1 = _apply(models.g1, g_params["g1"],
                                  state.batch_stats["g1"], x,
                                  train=True, rng=kg1)
            y_pred, s_g2 = _apply(models.g2, g_params["g2"],
                                  state.batch_stats["g2"],
                                  _cat(x, m_pred), train=True, rng=kg2)
            return (m_pred, y_pred), {"g1": s_g1, "g2": s_g2}

        if cfg.remat:
            # rematerialize: store only the inputs across the backward
            # and recompute the forward during the pullback — HBM for
            # FLOPs, the lever that admits full-resolution batches
            g_forward = jax.checkpoint(g_forward)
        (m_pred0, y_pred0), g_vjp, g_stats = jax.vjp(
            g_forward, state.g_params, has_aux=True)
        m_sg = jax.lax.stop_gradient(m_pred0)
        y_sg = jax.lax.stop_gradient(y_pred0)

        # ---- D phase ------------------------------------------------
        def d_loss_fn(d_params):
            s1, s2 = state.batch_stats["d1"], state.batch_stats["d2"]
            c1_real, s1 = _apply(models.d1, d_params["d1"], s1,
                                 _cat(x, m), train=True)
            c1_fake, s1 = _apply(models.d1, d_params["d1"], s1,
                                 _cat(x, m_sg), train=True)
            c2_real, s2 = _apply(models.d2, d_params["d2"], s2,
                                 _cat(x, m, y), train=True)
            c2_fake, s2 = _apply(models.d2, d_params["d2"], s2,
                                 _cat(x, m_sg, y_sg), train=True)
            if cfg.began:
                d1_real_l = l1_loss(c1_real, m)
                d1_fake_l = l1_loss(c1_fake, m_sg)
                d1 = d1_real_l - state.k1 * d1_fake_l
                d2_real_l = l1_loss(c2_real, y)
                d2_fake_l = l1_loss(c2_fake, y_sg)
                d2 = d2_real_l - state.k2 * d2_fake_l
            else:
                d1 = adv.d_loss(c1_real, c1_fake)
                d2 = adv.d_loss(c2_real, c2_fake)
                d1_real_l = d1_fake_l = d2_real_l = d2_fake_l = jnp.zeros(())
            d_total = cfg.lambda2 * d1 + cfg.lambda3 * d2
            aux = {
                "stats": (s1, s2),
                "D1": d1, "D2": d2, "D": d_total,
                "D1_real": c1_real.mean(), "D1_fake": c1_fake.mean(),
                "D2_real": c2_real.mean(), "D2_fake": c2_fake.mean(),
                "began": (d1_real_l, d1_fake_l, d2_real_l, d2_fake_l),
            }
            return d_total, aux

        if cfg.remat:
            d_loss_fn = jax.checkpoint(d_loss_fn)
        (_, d_aux), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        d_updates, opt_d = tx_d.update(d_grads, state.opt_d, state.d_params)
        d_updates = jax.tree.map(lambda u: u * lr_scale_d, d_updates)
        d_params = optax.apply_updates(state.d_params, d_updates)
        stats_d1, stats_d2 = d_aux["stats"]

        # ---- G phase (against the updated D) -------------------------
        # gradient w.r.t. the G predictions, pulled back through the
        # saved linearization: no second G forward.
        def g_loss_fn(preds):
            m_pred, y_pred = preds
            s1, s2 = stats_d1, stats_d2
            c1_real, s1 = _apply(models.d1, d_params["d1"], s1,
                                 _cat(x, m), train=True)
            c1_fake, s1 = _apply(models.d1, d_params["d1"], s1,
                                 _cat(x, m_pred), train=True)
            c2_real, s2 = _apply(models.d2, d_params["d2"], s2,
                                 _cat(x, m, y), train=True)
            c2_fake, s2 = _apply(models.d2, d_params["d2"], s2,
                                 _cat(x, m_pred, y_pred), train=True)
            if cfg.began:
                g1 = l1_loss(c1_fake, jax.lax.stop_gradient(m_pred))
                g2 = l1_loss(c2_fake, jax.lax.stop_gradient(y_pred))
            else:
                g1 = adv.g_loss(c1_real, c1_fake)
                g2 = adv.g_loss(c2_real, c2_fake)
            data1 = l1_loss(m_pred, m)
            data2 = l1_loss(y_pred, y)
            vis1 = _vis1(m_pred, m)
            vis2 = _vis2(y_pred, y)
            if cfg.softadapt:
                # dynamic weighting of the (adv, data, visual) groups —
                # the reference's dormant SoftAdapt design fed RAW group
                # losses with init weights [1, lambda1, lambda2]
                # (src/cgan.py:164-169); the lambdas live in the weights,
                # not the groups, so they are not applied twice.
                from shadow_removal_istd_tpu.losses import softadapt_combine
                groups = jnp.stack([
                    g1 + g2,
                    data1 + data2,
                    vis1 + vis2,
                ])
                g_total = softadapt_combine(state.softadapt, groups)
            else:
                groups = None
                g_total = (data1 + cfg.lambda1 * data2
                           + cfg.lambda2 * g1 + cfg.lambda3 * g2
                           + cfg.lambda4 * vis1 + cfg.lambda5 * vis2)
            aux = {
                "stats": (s1, s2),
                "G1": g1, "G2": g2, "data1": data1, "data2": data2,
                "vis1": vis1, "vis2": vis2, "G": g_total,
                "groups": groups,
            }
            return g_total, aux

        if cfg.remat:
            g_loss_fn = jax.checkpoint(g_loss_fn)
        (_, g_aux), pred_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)((m_pred0, y_pred0))
        (g_grads,) = g_vjp(pred_grads)
        g_updates, opt_g = tx_g.update(g_grads, state.opt_g, state.g_params)
        g_updates = jax.tree.map(lambda u: u * lr_scale_g, g_updates)
        g_params = optax.apply_updates(state.g_params, g_updates)

        stats_d1, stats_d2 = g_aux["stats"]
        new_stats = {"g1": g_stats["g1"], "g2": g_stats["g2"],
                     "d1": stats_d1, "d2": stats_d2}

        # BEGAN k balance (reference src/cgan.py:352-360)
        if cfg.began:
            d1r, d1f, d2r, d2f = d_aux["began"]
            k1 = began_k_update(state.k1, d1r, d1f)
            k2 = began_k_update(state.k2, d2r, d2f)
        else:
            k1, k2 = state.k1, state.k2

        softadapt = state.softadapt
        if cfg.softadapt:
            from shadow_removal_istd_tpu.losses import softadapt_update
            softadapt = softadapt_update(state.softadapt, g_aux["groups"])

        new_state = state.replace(
            step=state.step + 1,
            g_params=g_params, d_params=d_params,
            batch_stats=new_stats, opt_g=opt_g, opt_d=opt_d,
            k1=k1, k2=k2, softadapt=softadapt)

        metrics = {
            "G": g_aux["G"], "G1": g_aux["G1"], "G2": g_aux["G2"],
            "D": d_aux["D"], "D1": d_aux["D1"], "D2": d_aux["D2"],
            "data1": g_aux["data1"], "data2": g_aux["data2"],
            "vis1": g_aux["vis1"], "vis2": g_aux["vis2"],
            "D1_real": d_aux["D1_real"], "D1_fake": d_aux["D1_fake"],
            "D2_real": d_aux["D2_real"], "D2_fake": d_aux["D2_fake"],
        }
        return new_state, metrics

    return train_step


def make_eval_step(models: Models, cfg: TrainConfig, vgg_vars=None,
                   return_preds: bool = False):
    """Validation step: eval-mode forwards, no updates, same loss set.

    Mirrors the reference's ``run_epoch(training=False)``
    (src/cgan.py:244-251, 276-348): running BN stats, no dropout, the G
    adversarial terms computed from the D-phase scores.
    """
    adv = make_adversarial_loss(cfg.d_loss_fn, cfg.d_type, cfg.loss_mode)
    _vis1, _vis2 = _make_vis_fns(cfg, vgg_vars)

    def eval_step(state: TrainState, batch):
        x, m, y = batch
        m_pred, _ = _apply(models.g1, state.g_params["g1"],
                           state.batch_stats["g1"], x, train=False)
        y_pred, _ = _apply(models.g2, state.g_params["g2"],
                           state.batch_stats["g2"], _cat(x, m_pred),
                           train=False)
        c1_real, _ = _apply(models.d1, state.d_params["d1"],
                            state.batch_stats["d1"], _cat(x, m), train=False)
        c1_fake, _ = _apply(models.d1, state.d_params["d1"],
                            state.batch_stats["d1"], _cat(x, m_pred),
                            train=False)
        c2_real, _ = _apply(models.d2, state.d_params["d2"],
                            state.batch_stats["d2"], _cat(x, m, y),
                            train=False)
        c2_fake, _ = _apply(models.d2, state.d_params["d2"],
                            state.batch_stats["d2"],
                            _cat(x, m_pred, y_pred), train=False)
        if cfg.began:
            d1 = l1_loss(c1_real, m) - state.k1 * l1_loss(c1_fake, m_pred)
            d2 = l1_loss(c2_real, y) - state.k2 * l1_loss(c2_fake, y_pred)
            g1 = l1_loss(c1_fake, m_pred)
            g2 = l1_loss(c2_fake, y_pred)
        else:
            d1 = adv.d_loss(c1_real, c1_fake)
            d2 = adv.d_loss(c2_real, c2_fake)
            g1 = adv.g_loss(c1_real, c1_fake)
            g2 = adv.g_loss(c2_real, c2_fake)
        data1 = l1_loss(m_pred, m)
        data2 = l1_loss(y_pred, y)
        vis1 = _vis1(m_pred, m)
        vis2 = _vis2(y_pred, y)
        g_total = (data1 + cfg.lambda1 * data2 + cfg.lambda2 * g1
                   + cfg.lambda3 * g2 + cfg.lambda4 * vis1
                   + cfg.lambda5 * vis2)
        d_total = cfg.lambda2 * d1 + cfg.lambda3 * d2
        metrics = {
            "G": g_total, "G1": g1, "G2": g2,
            "D": d_total, "D1": d1, "D2": d2,
            "data1": data1, "data2": data2, "vis1": vis1, "vis2": vis2,
            # model-selection proxy (reference src/cgan.py:399)
            "total": 0.8 * g_total + 0.2 * d_total,
            "D1_real": c1_real.mean(), "D1_fake": c1_fake.mean(),
            "D2_real": c2_real.mean(), "D2_fake": c2_fake.mean(),
        }
        if return_preds:
            return metrics, (m_pred, y_pred)
        return metrics

    return jax.jit(eval_step)


def make_infer_step(models: Models):
    """Inference: m_pred = G1(x); y_pred = G2(x ++ m_pred), eval mode
    (reference src/cgan.py:436-438)."""

    def infer_step(g_params, batch_stats, x):
        m_pred, _ = _apply(models.g1, g_params["g1"], batch_stats["g1"], x,
                           train=False)
        y_pred, _ = _apply(models.g2, g_params["g2"], batch_stats["g2"],
                           _cat(x, m_pred), train=False)
        return m_pred, y_pred

    return jax.jit(infer_step)
