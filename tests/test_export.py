"""Serving export: serialized StableHLO artifact round-trip."""
import numpy as np

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.engine import (
    TrainConfig,
    build_models,
    init_state,
    make_infer_step,
)
from shadow_removal_istd_tpu.tools.export import (
    export_stacked_inference,
    load_exported,
)


def _setup():
    cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                      use_visual_loss=False, droprate=0.0,
                      steps_per_epoch=1)
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models)
    return models, state


class TestExport:
    def test_roundtrip_matches_infer_step(self, tmp_path):
        models, state = _setup()
        path = str(tmp_path / "model.shlo")
        nbytes = export_stacked_inference(
            path, state, models, image_shape=(32, 32), batch_size=2,
            platforms=("cpu",))
        assert nbytes > 0

        x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3)) * 2 - 1
        m_ref, y_ref = make_infer_step(models)(
            state.g_params, state.batch_stats, x)

        run = load_exported(path)
        m, y = run(x)
        assert m.shape == (2, 32, 32, 1) and y.shape == (2, 32, 32, 3)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-6)

    def test_symbolic_batch_serves_any_batch(self, tmp_path):
        models, state = _setup()
        path = str(tmp_path / "model_b.shlo")
        export_stacked_inference(path, state, models, image_shape=(32, 32),
                                 batch_size=None, platforms=("cpu",))
        run = load_exported(path)
        infer = make_infer_step(models)
        for b in (1, 3):
            x = jax.random.uniform(jax.random.key(b),
                                   (b, 32, 32, 3)) * 2 - 1
            m, y = run(x)
            m_ref, _ = infer(state.g_params, state.batch_stats, x)
            assert m.shape == (b, 32, 32, 1)
            np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                       atol=1e-6)

    def test_standalone_export_cli(self, tmp_path):
        """checkpoint -> python -m ...tools.export -> runnable artifact."""
        from shadow_removal_istd_tpu.engine.checkpoint import (
            save_checkpoint)
        from shadow_removal_istd_tpu.tools.export import main as export_main
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=2,
                          use_visual_loss=False, droprate=0.0,
                          steps_per_epoch=1)
        models = build_models(cfg)
        # key(42), NOT key(0): tools/export.py falls back to a fresh
        # init_state(key(0)) before loading — saving a key(0) state
        # would make "came from the checkpoint" indistinguishable from
        # a silently dropped load
        state = init_state(jax.random.key(42), cfg, models)
        ckpt = str(tmp_path / "checkpoint.msgpack")
        save_checkpoint(state, ckpt, epoch=7)
        out = str(tmp_path / "served.shlo")
        export_main(["--load-checkpoint", ckpt, "--out", out,
                     "--shape", "32", "32", "--batch", "1",
                     "--ngf", "4", "--platforms", "cpu"])
        m, y = load_exported(out)(jnp.zeros((1, 32, 32, 3), jnp.float32))
        assert m.shape == (1, 32, 32, 1) and y.shape == (1, 32, 32, 3)
        # params actually came from the checkpoint, not the fresh init
        m_ref, _ = make_infer_step(models)(
            state.g_params, state.batch_stats,
            jnp.zeros((1, 32, 32, 3), jnp.float32))
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   atol=1e-6)

    def test_artifact_is_self_contained(self, tmp_path):
        # the serialized bytes must deserialize and run through
        # jax.export alone (no package model code in the load path)
        models, state = _setup()
        path = str(tmp_path / "model_sc.shlo")
        export_stacked_inference(path, state, models, image_shape=(32, 32),
                                 batch_size=1, platforms=("cpu",))
        from jax import export as jax_export
        with open(path, "rb") as f:
            exported = jax_export.deserialize(f.read())
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        m, y = exported.call(x)
        assert np.isfinite(np.asarray(m)).all()
        assert np.isfinite(np.asarray(y)).all()


class TestExportGatedFusedPath:
    def test_roundtrip_at_gated_resolution(self, tmp_path):
        """Export at 256x320 — above the phase-affine fast-path area
        gate (models/mnet.py::_Up), like the default 480x640 serving
        shape — and check the artifact reproduces the direct apply.
        nn_upconv=True is load-bearing: the gate also requires the
        NN-upsample decoder (no_conv_t), which TrainConfig defaults
        off."""
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=1,
                          nn_upconv=True,
                          use_visual_loss=False, droprate=0.0,
                          steps_per_epoch=1)
        models = build_models(cfg)
        state = init_state(jax.random.key(0), cfg, models)
        path = str(tmp_path / "model_big.shlo")
        export_stacked_inference(path, state, models,
                                 image_shape=(256, 320), batch_size=1,
                                 platforms=("cpu",))
        run = load_exported(path)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (1, 256, 320, 3)).astype(np.float32))
        m, y = run(x)
        infer = make_infer_step(models)
        m_ref, y_ref = infer(state.g_params, state.batch_stats, x)
        np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-5)
