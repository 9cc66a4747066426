"""Train state: all four networks + both optimizers as one pytree.

The reference holds G1/G2/D1/D2 modules, two Adam optimizers and two LR
schedulers as Python objects (src/cgan.py:35-94); here the whole training
state is a single immutable pytree that flows through the jitted step and
checkpoints as one unit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from shadow_removal_istd_tpu.engine.config import TrainConfig
from shadow_removal_istd_tpu.models import get_discriminator, get_generator


class Models(struct.PyTreeNode):
    """Static container of the four network definitions."""

    g1: Any = struct.field(pytree_node=False)
    g2: Any = struct.field(pytree_node=False)
    d1: Any = struct.field(pytree_node=False)
    d2: Any = struct.field(pytree_node=False)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any           # {"g1": ..., "g2": ...}
    d_params: Any           # {"d1": ..., "d2": ...}
    batch_stats: Any        # {"g1","g2","d1","d2"} (possibly empty dicts)
    opt_g: optax.OptState
    opt_d: optax.OptState
    k1: jnp.ndarray         # BEGAN balance terms (reference src/cgan.py:211)
    k2: jnp.ndarray
    softadapt: Any = None   # SoftAdaptState when cfg.softadapt


def build_models(cfg: TrainConfig) -> Models:
    """Instantiate G1(3->1), G2(4->3), D1(4 in), D2(7 in) per the
    reference's channel wiring (src/cgan.py:35-66)."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    g_kw = dict(ngf=cfg.ngf, drop_rate=cfg.droprate, no_conv_t=cfg.nn_upconv,
                use_selu=cfg.use_selu, activation=cfg.activation,
                dtype=dtype)
    d_kw = dict(ndf=cfg.ndf, use_selu=cfg.use_selu, use_sigmoid=False,
                dtype=dtype)
    return Models(
        g1=get_generator(cfg.net_g, in_channels=3, out_channels=1, **g_kw),
        g2=get_generator(cfg.net_g, in_channels=3 + 1, out_channels=3, **g_kw),
        d1=get_discriminator(cfg.net_d, in_channels=3 + 1, out_channels=1,
                             **d_kw),
        d2=get_discriminator(cfg.net_d, in_channels=3 + 3 + 1, out_channels=3,
                             **d_kw),
    )


def make_optimizers(cfg: TrainConfig):
    """Two Adam chains with per-epoch exponential lr decay.

    Reference: joint Adam over G1+G2 and D1+D2 params with
    ExponentialLR(gamma = 1 - decay) stepped once per epoch
    (src/cgan.py:85-94, 382-384).
    """
    spe = max(cfg.steps_per_epoch, 1)

    def sched(base_lr):
        if cfg.lr_schedule == "plateau":
            # plateau scaling is applied to the updates by the train
            # step (engine/schedules.py controller on the host)
            return base_lr

        def lr(count):
            epoch = count // spe
            return base_lr * (1.0 - cfg.decay) ** epoch
        return lr

    tx_g = optax.adam(sched(cfg.lr_g), b1=cfg.beta1, b2=cfg.beta2,
                      eps=cfg.adam_eps)
    tx_d = optax.adam(sched(cfg.lr_d), b1=cfg.beta1, b2=cfg.beta2,
                      eps=cfg.adam_eps)
    return tx_g, tx_d


def init_state(rng: jax.Array, cfg: TrainConfig, models: Models,
               image_size: int | None = None) -> TrainState:
    """Initialize all four networks and both optimizer states."""
    size = image_size or cfg.image_size
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x1 = jnp.zeros((1, size, size, 3), jnp.float32)
    x2 = jnp.zeros((1, size, size, 4), jnp.float32)
    xd1 = jnp.zeros((1, size, size, 4), jnp.float32)
    xd2 = jnp.zeros((1, size, size, 7), jnp.float32)

    v_g1 = models.g1.init({"params": k1}, x1)
    v_g2 = models.g2.init({"params": k2}, x2)
    v_d1 = models.d1.init({"params": k3}, xd1)
    v_d2 = models.d2.init({"params": k4}, xd2)

    g_params = {"g1": v_g1["params"], "g2": v_g2["params"]}
    d_params = {"d1": v_d1["params"], "d2": v_d2["params"]}
    batch_stats = {
        "g1": v_g1.get("batch_stats", {}),
        "g2": v_g2.get("batch_stats", {}),
        "d1": v_d1.get("batch_stats", {}),
        "d2": v_d2.get("batch_stats", {}),
    }
    tx_g, tx_d = make_optimizers(cfg)
    softadapt = None
    if cfg.softadapt:
        from shadow_removal_istd_tpu.losses import softadapt_init
        # groups (adv, data, visual) with the reference's intended
        # init weights [1, lambda1, lambda2] (src/cgan.py:164-169)
        softadapt = softadapt_init(
            3, init_weights=[1.0, cfg.lambda1, cfg.lambda2])
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        batch_stats=batch_stats,
        opt_g=tx_g.init(g_params),
        opt_d=tx_d.init(d_params),
        k1=jnp.zeros((), jnp.float32),
        k2=jnp.zeros((), jnp.float32),
        softadapt=softadapt,
    )


def param_count(tree: Any) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(tree))
