"""Mixed-precision (bf16 compute / f32 params) tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.engine import (
    TrainConfig,
    build_models,
    init_state,
    make_train_step,
)
from shadow_removal_istd_tpu.models import get_generator


def _batch(n=2, s=32):
    ks = jax.random.split(jax.random.key(3), 3)
    return (jax.random.uniform(ks[0], (n, s, s, 3)) * 2 - 1,
            jax.random.uniform(ks[1], (n, s, s, 1)) * 2 - 1,
            jax.random.uniform(ks[2], (n, s, s, 3)) * 2 - 1)


class TestMixedPrecision:
    def test_params_stay_f32_activations_bf16(self):
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=8,
                          dtype=jnp.bfloat16)
        v = g.init({"params": jax.random.key(0)},
                   jnp.zeros((1, 32, 32, 3)))
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(v["params"]))
        out = g.apply(v, jnp.zeros((1, 32, 32, 3)))
        assert out.dtype == jnp.bfloat16

    def test_bn_stats_stay_f32(self):
        g = get_generator("mnet", in_channels=3, out_channels=1, ngf=8,
                          dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
        v = g.init({"params": jax.random.key(1)}, x)
        _, upd = g.apply(v, x, train=True, mutable=["batch_stats"])
        assert all(s.dtype == jnp.float32
                   for s in jax.tree.leaves(upd["batch_stats"]))

    @pytest.mark.slow
    def test_bf16_train_step_close_to_f32(self):
        batch = _batch()
        results = {}
        for dt in ("float32", "bfloat16"):
            cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                              use_visual_loss=False, droprate=0.0,
                              steps_per_epoch=1, compute_dtype=dt)
            models = build_models(cfg)
            state = init_state(jax.random.key(0), cfg, models)
            step = make_train_step(models, cfg)
            for i in range(3):
                state, metrics = step(state, batch, jax.random.key(i))
            results[dt] = float(metrics["G"])
        assert np.isfinite(results["bfloat16"])
        # bf16 training should track f32 within a few percent
        assert abs(results["bfloat16"] - results["float32"]) \
            < 0.05 * abs(results["float32"]) + 0.05
        # ...but NOT be identical: equality would mean the
        # compute_dtype gate is inert and both arms ran f32 (the
        # closeness assert alone cannot catch a silently dropped gate)
        assert results["bfloat16"] != results["float32"]

    def test_config_gate_reaches_models(self):
        # the TrainConfig -> build_models wiring, not just the direct
        # get_generator(dtype=...) constructor used above
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                          use_visual_loss=False, droprate=0.0,
                          compute_dtype="bfloat16")
        models = build_models(cfg)
        v = models.g1.init({"params": jax.random.key(0)},
                           jnp.zeros((1, 32, 32, 3)))
        out = models.g1.apply(v, jnp.zeros((1, 32, 32, 3)))
        assert out.dtype == jnp.bfloat16

    def test_grads_are_f32(self):
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                          use_visual_loss=False, droprate=0.0,
                          compute_dtype="bfloat16")
        models = build_models(cfg)
        state = init_state(jax.random.key(0), cfg, models)
        step = make_train_step(models, cfg)
        new_state, _ = step(state, _batch(), jax.random.key(1))
        # updated params remain f32 (master weights)
        assert all(p.dtype == jnp.float32
                   for p in jax.tree.leaves(new_state.g_params))
