"""Engine tests: the jitted adversarial train step, eval step, modes."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.engine import (
    TrainConfig,
    build_models,
    init_state,
    make_eval_step,
    make_infer_step,
    make_train_step,
)

SIZE = 32
BATCH = 2


def tiny_cfg(**kw):
    base = dict(ngf=4, ndf=4, image_size=SIZE, batch_size=BATCH,
                use_visual_loss=False, droprate=0.0, steps_per_epoch=2)
    base.update(kw)
    return TrainConfig(**base)


def make_batch(seed=0):
    k = jax.random.key(seed)
    ks = jax.random.split(k, 3)
    x = jax.random.uniform(ks[0], (BATCH, SIZE, SIZE, 3)) * 2 - 1
    m = jax.random.uniform(ks[1], (BATCH, SIZE, SIZE, 1)) * 2 - 1
    y = jax.random.uniform(ks[2], (BATCH, SIZE, SIZE, 3)) * 2 - 1
    return (x, m, y)


def setup(cfg):
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models)
    return models, state


class TestTrainStep:
    def test_updates_params_and_step(self):
        cfg = tiny_cfg()
        models, state = setup(cfg)
        step = make_train_step(models, cfg)
        # the step donates its input state; snapshot before stepping
        old_g = jax.device_get(state.g_params)
        old_d = jax.device_get(state.d_params)
        new_state, metrics = step(state, make_batch(), jax.random.key(1))
        assert int(new_state.step) == 1
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        # both G and D params moved
        g_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                              old_g, jax.device_get(new_state.g_params))
        assert max(jax.tree.leaves(g_diff)) > 0
        d_diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                              old_d, jax.device_get(new_state.d_params))
        assert max(jax.tree.leaves(d_diff)) > 0

    def test_supervised_convergence_with_dummy_d(self):
        # dummy D zeroes lambda2/lambda3 (reference src/cgan.py:160-162):
        # pure supervised training must reduce the L1 losses.
        cfg = tiny_cfg(net_d="dummy", lambda4=0.0, lambda5=0.0)
        assert cfg.lambda2 == 0.0 and cfg.lambda3 == 0.0
        models, state = setup(cfg)
        step = make_train_step(models, cfg)
        batch = make_batch()
        first = None
        for i in range(30):
            state, metrics = step(state, batch, jax.random.key(i))
            if first is None:
                first = float(metrics["data1"]) + float(metrics["data2"])
        last = float(metrics["data1"]) + float(metrics["data2"])
        assert last < first * 0.9, (first, last)

    def test_began_mode_runs_and_k_stays_clipped(self):
        # with random init the k balance term is usually negative and k
        # stays clipped at 0 (same as the reference would); assert the
        # mode runs, ks stay in [0,1] and losses are finite. The k
        # update formula itself is unit-tested in test_losses.
        cfg = tiny_cfg(net_d="began")
        models, state = setup(cfg)
        step = make_train_step(models, cfg)
        k1_before = float(state.k1)  # snapshot: the step donates state
        state1, metrics = step(state, make_batch(), jax.random.key(1))
        assert k1_before == 0.0
        assert 0.0 <= float(state1.k1) <= 1.0
        assert 0.0 <= float(state1.k2) <= 1.0
        assert np.isfinite(float(metrics["D"]))
        assert np.isfinite(float(metrics["G"]))

    @pytest.mark.parametrize("d_type", ["normal", "rel", "rel_avg"])
    def test_adversarial_variants_run(self, d_type):
        cfg = tiny_cfg(d_type=d_type)
        models, state = setup(cfg)
        step = make_train_step(models, cfg)
        _, metrics = step(state, make_batch(), jax.random.key(1))
        assert np.isfinite(float(metrics["G"]))
        assert np.isfinite(float(metrics["D"]))

    def test_lr_decays_per_epoch(self):
        # schedule: lr * (1-decay)^(step // steps_per_epoch), verified
        # through the REAL optimizer: with a constant unit gradient,
        # Adam's update magnitude is ~lr(count), so the per-epoch decay
        # must show up in the actual updates it emits
        from shadow_removal_istd_tpu.engine.state import make_optimizers
        cfg = tiny_cfg(decay=0.5, steps_per_epoch=2, lr_g=1.0,
                       adam_eps=1e-8)
        tx_g, _ = make_optimizers(cfg)
        params = {"w": jnp.zeros(4)}
        grads = {"w": jnp.ones(4)}
        opt = tx_g.init(params)
        mags = []
        for _ in range(6):
            upd, opt = tx_g.update(grads, opt, params)
            mags.append(float(jnp.abs(upd["w"]).mean()))
        # counts 0,1 -> epoch 0 (lr 1.0); 2,3 -> 0.5; 4,5 -> 0.25
        assert mags[0] == pytest.approx(1.0, rel=1e-3)
        assert mags[1] == pytest.approx(1.0, rel=1e-3)
        assert mags[2] == pytest.approx(0.5, rel=1e-3)
        assert mags[4] == pytest.approx(0.25, rel=1e-3)


class TestEvalStep:
    def test_total_is_weighted_sum(self):
        cfg = tiny_cfg()
        models, state = setup(cfg)
        ev = make_eval_step(models, cfg)
        m = ev(state, make_batch())
        assert float(m["total"]) == pytest.approx(
            0.8 * float(m["G"]) + 0.2 * float(m["D"]), rel=1e-5)

    def test_eval_deterministic(self):
        cfg = tiny_cfg(droprate=0.5)
        models, state = setup(cfg)
        ev = make_eval_step(models, cfg)
        m1 = ev(state, make_batch())
        m2 = ev(state, make_batch())
        assert float(m1["G"]) == float(m2["G"])


class TestInferStep:
    def test_stacked_outputs(self):
        cfg = tiny_cfg()
        models, state = setup(cfg)
        infer = make_infer_step(models)
        x = make_batch()[0]
        m_pred, y_pred = infer(state.g_params, state.batch_stats, x)
        assert m_pred.shape == (BATCH, SIZE, SIZE, 1)
        assert y_pred.shape == (BATCH, SIZE, SIZE, 3)


class TestCheckpoint:
    def test_full_state_roundtrip(self, tmp_path):
        from shadow_removal_istd_tpu.engine import checkpoint as ckpt
        cfg = tiny_cfg()
        models, state = setup(cfg)
        step = make_train_step(models, cfg)
        state, _ = step(state, make_batch(), jax.random.key(1))
        path = str(tmp_path / "ckpt.msgpack")
        ckpt.save_checkpoint(state, path, epoch=7)
        fresh = init_state(jax.random.key(9), cfg, models)
        restored, epoch, _ = ckpt.load_checkpoint(fresh, path)
        assert epoch == 7
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)

    def test_orbax_roundtrip(self, tmp_path):
        from shadow_removal_istd_tpu.engine import checkpoint as ckpt
        cfg = tiny_cfg()
        models, state = setup(cfg)
        ckpt.save_checkpoint_orbax(state, str(tmp_path), step=5,
                                   host={"best_loss": 1.25})
        fresh = init_state(jax.random.key(9), cfg, models)
        restored, epoch, host = ckpt.load_checkpoint_orbax(
            fresh, str(tmp_path), step=5)
        assert epoch == 5 and host["best_loss"] == 1.25
        for a, b in zip(jax.tree.leaves(state.g_params),
                        jax.tree.leaves(restored.g_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # latest-step resolution + step_N-dir addressing
        ckpt.save_checkpoint_orbax(state, str(tmp_path), step=9)
        assert ckpt.latest_orbax_step(str(tmp_path)) == 9
        _, epoch, _ = ckpt.load_checkpoint_orbax(fresh, str(tmp_path))
        assert epoch == 9
        _, epoch, _ = ckpt.load_checkpoint_orbax(
            fresh, str(tmp_path / "step_5"))
        assert epoch == 5

    def test_per_net_weights_roundtrip(self, tmp_path):
        from shadow_removal_istd_tpu.engine import checkpoint as ckpt
        cfg = tiny_cfg()
        models, state = setup(cfg)
        files = ckpt.save_model_weights(state, models, str(tmp_path), "best")
        assert len(files) == 4
        assert any("G1_MNet_best" in f for f in files)
        fresh = init_state(jax.random.key(5), cfg, models)
        g1_file = [f for f in files if "G1_" in f][0]
        loaded = ckpt.load_model_weights(fresh, "G1", g1_file)
        for a, b in zip(jax.tree.leaves(state.g_params["g1"]),
                        jax.tree.leaves(loaded.g_params["g1"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # g2 untouched
        assert not all(
            np.allclose(a, b) for a, b in
            zip(jax.tree.leaves(state.g_params["g2"]),
                jax.tree.leaves(loaded.g_params["g2"])))


class TestResumeDeterminism:
    """A resumed run must replay the uninterrupted run bit-for-bit:
    shuffle order, augment draws, and dropout keys are pure functions
    of (seed, epoch, step) — never of how much RNG state the process
    consumed before — and the checkpoint carries the full train state.
    (The reference cannot do this: torch RNG state is absent from its
    checkpoint.tar, src/cgan.py:490-509.)"""

    def _make(self, tmp_path, tag):
        from shadow_removal_istd_tpu.data.synthetic import (
            synthetic_triplets,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        data = synthetic_triplets(8, SIZE, SIZE)
        streams = {k: data[k] for k in ("img", "matte", "target")}
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, droprate=0.5)
        run = RunConfig(logs_dir=str(tmp_path / f"logs{tag}"),
                        weights_dir=str(tmp_path / f"w{tag}"),
                        checkpoint_path=str(tmp_path / f"ck{tag}.msgpack"),
                        valid_every=10**6, save_every=10**6,
                        log_every=10**6, vis_every=10**6,
                        preempt_save=False)
        return Trainer(cfg, run, train_streams=streams), run

    def test_resumed_equals_uninterrupted(self, tmp_path):
        tr_a, _ = self._make(tmp_path, "a")
        tr_a.train(3)
        tr_b, run_b = self._make(tmp_path, "b")
        tr_b.train(2)
        tr_b.save(2)
        tr_c, _ = self._make(tmp_path, "c")
        tr_c.load(run_b.checkpoint_path)
        assert tr_c.start_epoch == 2
        tr_c.train(3)
        a_leaves = jax.tree.leaves(jax.device_get(
            (tr_a.state.g_params, tr_a.state.d_params,
             tr_a.state.batch_stats)))
        c_leaves = jax.tree.leaves(jax.device_get(
            (tr_c.state.g_params, tr_c.state.d_params,
             tr_c.state.batch_stats)))
        assert len(a_leaves) == len(c_leaves)
        for a, c in zip(a_leaves, c_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_resumed_equals_uninterrupted_orbax(self, tmp_path):
        """The orbax backend (async directory checkpoints) round-trips
        the full train state exactly like msgpack: a preempt->resume
        cycle through --checkpoint-backend orbax is bit-identical to
        the uninterrupted run (VERDICT r4 item 6)."""
        def make(tag):
            tr, run = self._make(tmp_path, tag)
            tr.run.checkpoint_backend = "orbax"
            tr.run.checkpoint_path = str(tmp_path / f"orbax{tag}")
            return tr, tr.run

        tr_a, _ = self._make(tmp_path, "a")
        tr_a.train(3)
        tr_b, run_b = make("b")
        tr_b.train(2)
        tr_b.save(2)          # async commit
        tr_c, _ = make("c")
        tr_b._drain_async_saves()
        tr_c.load(run_b.checkpoint_path)  # directory, latest step
        assert tr_c.start_epoch == 2
        tr_c.train(3)
        a_leaves = jax.tree.leaves(jax.device_get(
            (tr_a.state.g_params, tr_a.state.d_params,
             tr_a.state.batch_stats)))
        c_leaves = jax.tree.leaves(jax.device_get(
            (tr_c.state.g_params, tr_c.state.d_params,
             tr_c.state.batch_stats)))
        assert len(a_leaves) == len(c_leaves)
        for a, c in zip(a_leaves, c_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_host_state_survives_resume(self, tmp_path):
        """best_loss and the plateau controllers ride the checkpoint
        (the reference stores its scheduler state dicts in
        checkpoint.tar, src/cgan.py:490-509; it loses best-loss)."""
        from shadow_removal_istd_tpu.data.synthetic import (
            synthetic_triplets,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        data = synthetic_triplets(4, SIZE, SIZE)
        streams = {k: data[k] for k in ("img", "matte", "target")}
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, lr_schedule="plateau")
        run = RunConfig(logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"),
                        checkpoint_path=str(tmp_path / "ck.msgpack"),
                        preempt_save=False)
        tr = Trainer(cfg, run, train_streams=streams)
        # drive the controller into a reduced-lr + cooldown regime
        tr.plateau_g.step(1.0)
        for _ in range(12):
            tr.plateau_g.step(2.0)
        assert tr.plateau_g.scale < 1.0
        tr.plateau_d.step(3.0)
        tr.best_loss = 0.125
        tr.save(9)
        tr2 = Trainer(cfg, run, train_streams=streams)
        tr2.load()
        assert tr2.start_epoch == 9
        assert tr2.best_loss == 0.125
        assert tr2.plateau_g.state_dict() == tr.plateau_g.state_dict()
        assert tr2.plateau_d.state_dict() == tr.plateau_d.state_dict()


class TestEvalMetricsProtocol:
    """--eval-metrics must use the binary mask stream when available
    (reference src/eval.py:67-70), not the matte threshold."""

    def test_mask_stream_loaded_and_binarized(self, tmp_path):
        from shadow_removal_istd_tpu.data.istd import ISTDDataset
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        root = str(tmp_path / "ISTD")
        write_istd_layout(root, n_train=4, n_test=3, h=64, w=64)
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, batch_size=2,
                       image_size=32)
        run = RunConfig(data_dirs=(root,), eval_metrics=True,
                        logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"))
        tr = Trainer(cfg, run)
        assert tr._valid_masks is not None
        assert tr._has_protocol_masks()
        # binarization == img_as_bool semantics: uint8 >= 128
        u8 = ISTDDataset(root, "test", datas=("mask",)).load_all()["mask"]
        got = np.asarray(tr._protocol_mask(None, 0, 2))
        np.testing.assert_array_equal(got, u8[:2, ..., 0] >= 128)
        # the validation epoch runs the protocol end-to-end (including
        # the ragged final batch) without error
        total = tr.run_valid_epoch(0)
        assert np.isfinite(total)

    def test_missing_mask_dir_degrades_to_proxy(self, tmp_path):
        # a directory dataset WITHOUT test_B must not crash Trainer
        # init under --eval-metrics; it degrades to the matte proxy
        # like the reference-layout h5 branch
        import shutil

        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        root = str(tmp_path / "ISTD")
        write_istd_layout(root, n_train=4, n_test=3, h=64, w=64)
        shutil.rmtree(os.path.join(root, "test", "test_B"))
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, batch_size=2,
                       image_size=32)
        run = RunConfig(data_dirs=(root,), eval_metrics=True,
                        logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"))
        tr = Trainer(cfg, run)
        assert tr._valid_masks is None
        assert not tr._has_protocol_masks()  # -> EvalProxy tag

    def test_injected_valid_streams_not_clobbered(self, tmp_path):
        # injecting valid_streams while train comes from a directory
        # source must keep the injected validation data (it used to be
        # silently replaced by the source's test split)
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        root = str(tmp_path / "ISTD")
        write_istd_layout(root, n_train=4, n_test=3, h=64, w=64)
        n_inj = 5  # != the source's 3 test samples
        streams = {
            "img": np.zeros((n_inj, 32, 32, 3), np.uint8),
            "matte": np.zeros((n_inj, 32, 32, 1), np.uint8),
            "target": np.zeros((n_inj, 32, 32, 3), np.uint8),
        }
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, batch_size=2,
                       image_size=32)
        run = RunConfig(data_dirs=(root,),
                        logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"))
        names = [f"inj{i}" for i in range(n_inj)]
        tr = Trainer(cfg, run, valid_streams=streams, valid_names=names)
        assert tr.valid_names == names
        assert len(tr.valid_pipe) == -(-n_inj // cfg.batch_size)
        assert tr.train_pipe is not None  # train still from the source

    def test_injected_streams_fall_back_to_proxy(self):
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0)
        streams = {
            "img": np.zeros((2, SIZE, SIZE, 3), np.uint8),
            "matte": np.zeros((2, SIZE, SIZE, 1), np.uint8),
            "target": np.zeros((2, SIZE, SIZE, 3), np.uint8),
        }
        tr = Trainer(cfg, RunConfig(eval_metrics=True),
                     train_streams=streams, valid_streams=streams)
        assert tr._valid_masks is None
        assert not tr._has_protocol_masks()  # -> EvalProxy tag
        m = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, SIZE, SIZE, 1)).astype(np.float32))
        got = np.asarray(tr._protocol_mask(m, 0, 2))
        np.testing.assert_array_equal(got, np.asarray(m)[..., 0] > 0.0)

    def test_injected_streams_never_pair_with_source_masks(self,
                                                           tmp_path):
        """Injected validation streams must NOT be paired with a mask
        stream loaded from run.data_h5/data_dirs — those masks are
        ordered against a DIFFERENT validation set (wrong metrics, or a
        mid-validation shape mismatch when counts differ)."""
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0)
        streams = {
            "img": np.zeros((2, SIZE, SIZE, 3), np.uint8),
            "matte": np.zeros((2, SIZE, SIZE, 1), np.uint8),
            "target": np.zeros((2, SIZE, SIZE, 3), np.uint8),
        }
        # data_h5 points at a path that would even fail to open — the
        # guard must short-circuit before any source load is attempted
        run = RunConfig(eval_metrics=True,
                        data_h5=str(tmp_path / "unrelated.h5"))
        tr = Trainer(cfg, run, train_streams=streams,
                     valid_streams=streams)
        assert tr._valid_masks is None
        assert not tr._has_protocol_masks()  # -> EvalProxy tag

    def test_h5_mask_stream_feeds_eval_protocol(self, tmp_path):
        import pytest as _pytest
        _pytest.importorskip("h5py")
        from shadow_removal_istd_tpu.data.h5 import build_h5
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        root = str(tmp_path / "ISTD")
        write_istd_layout(root, n_train=4, n_test=2, h=64, w=64)
        h5_path = str(tmp_path / "istd.h5")
        build_h5(h5_path, root)
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, batch_size=2,
                       image_size=32)
        run = RunConfig(data_h5=h5_path, eval_metrics=True,
                        logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"))
        tr = Trainer(cfg, run)
        assert tr._valid_masks is not None
        assert tr._has_protocol_masks()
        assert np.isfinite(tr.run_valid_epoch(0))


class TestEvalBitAlignment:
    """Eval/* scalars must equal the offline protocol run on the PNGs
    infer() writes — the in-training path snaps both sides to their
    PNG uint8 grids (prediction via the writer's floor quantization,
    reference src/utils.py:65-67; target via rounding back to its
    uint8 source grid) before the LAB conversion, so there is no
    float-vs-8-bit gap left (reference protocol scores 8-bit PNGs,
    src/eval.py:63-70)."""

    def test_eval_scalars_match_offline_cli(self, tmp_path):
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics
        root = str(tmp_path / "ISTD")
        write_istd_layout(root, n_train=2, n_test=3, h=32, w=64)
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, batch_size=2,
                       image_size=32)
        run = RunConfig(data_dirs=(root,), eval_metrics=True,
                        logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"),
                        infered_dir=str(tmp_path / "infered"))
        tr = Trainer(cfg, run)
        captured = {}

        class _Cap:
            def add_scalar(self, k, v, e):
                captured[k] = float(v)

            def add_image(self, *a, **k):
                pass

            def flush(self):
                pass

        tr._writers["valid"] = _Cap()
        tr.run_valid_epoch(0)
        tr.infer()  # same (untrained) params -> same predictions
        offline = all_metrics(
            os.path.join(root, "test", "test_C_fixed"),
            os.path.join(run.infered_dir, "shadowless", "ISTD"),
            maskdir=os.path.join(root, "test", "test_B"))
        for k in ("rmse", "rmse_non", "rmse_all",
                  "mae", "mae_non", "mae_all"):
            assert f"Eval/{k}" in captured
            # the only slack: eval_step and infer_step are separate
            # XLA graphs, so a pixel sitting within float noise of a
            # quantization boundary may land one uint8 level apart
            np.testing.assert_allclose(
                captured[f"Eval/{k}"], offline[k], rtol=5e-4,
                err_msg=k)

    @pytest.mark.slow
    def test_eval_scalars_match_offline_cli_native_resolution(
            self, tmp_path):
        """The same alignment at ISTD-native 480x640 — the resolution
        the protocol actually scores (the fast test above runs 32x64).
        Train one epoch on 256^2 crops, validate + infer at native
        resolution with --eval-metrics, and the offline CLI on the
        written PNGs must reproduce Eval/* (same quantization-boundary
        slack as above: eval_step and infer_step are separate XLA
        graphs). VERDICT r4 item 8."""
        from shadow_removal_istd_tpu.data.synthetic import (
            write_istd_layout,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        from shadow_removal_istd_tpu.metrics.eval_cli import all_metrics
        root = str(tmp_path / "ISTD")
        write_istd_layout(root, n_train=2, n_test=2, h=480, w=640)
        cfg = tiny_cfg(ngf=8, ndf=8, lambda4=0.0, lambda5=0.0,
                       batch_size=2, image_size=256)
        run = RunConfig(data_dirs=(root,), eval_metrics=True,
                        valid_every=1, save_every=10**6, log_every=10**6,
                        vis_every=10**6, preempt_save=False,
                        logs_dir=str(tmp_path / "logs"),
                        weights_dir=str(tmp_path / "w"),
                        checkpoint_path=str(tmp_path / "ck.msgpack"),
                        infered_dir=str(tmp_path / "infered"))
        tr = Trainer(cfg, run)
        captured = {}

        class _Cap:
            def add_scalar(self, k, v, e):
                captured[k] = float(v)

            def add_image(self, *a, **k):
                pass

            def flush(self):
                pass

        tr._writers["valid"] = _Cap()
        tr._writers["train"] = _Cap()
        tr.train(1)          # one real epoch of 256^2 crops
        captured.clear()
        tr.run_valid_epoch(1)   # native 480x640 validation, Eval/*
        tr.infer()              # native 480x640 PNGs, trained params
        offline = all_metrics(
            os.path.join(root, "test", "test_C_fixed"),
            os.path.join(run.infered_dir, "shadowless", "ISTD"),
            maskdir=os.path.join(root, "test", "test_B"))
        for k in ("rmse", "rmse_non", "rmse_all",
                  "mae", "mae_non", "mae_all"):
            assert f"Eval/{k}" in captured
            np.testing.assert_allclose(
                captured[f"Eval/{k}"], offline[k], rtol=5e-4,
                err_msg=k)

    def test_target_grid_recovery_survives_bf16(self):
        """The target-side round() must recover the exact uint8 source
        grid even when the eval batch is bf16 (production dtype):
        bf16's worst-case half-ulp on [0.5, 1) is 2^-9, and
        2^-9 * 255 = 0.498 < 0.5 — every one of the 256 levels
        round-trips. Checked exhaustively."""
        u8 = np.arange(256, dtype=np.uint8)
        normed = (u8.astype(np.float32) / 255.0 - 0.5) * 2.0  # loader
        bf = jnp.asarray(normed, jnp.bfloat16)
        q = jnp.round(jnp.clip(
            bf.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0) * 255.0)
        np.testing.assert_array_equal(np.asarray(q),
                                      u8.astype(np.float32))


class TestRemat:
    """--remat (jax.checkpoint around the step phases) must change
    memory behavior only — the math is identical."""

    def test_remat_actually_rematerializes(self):
        # the equivalence test below passes trivially if the cfg.remat
        # gate is inert (two identical graphs) — pin that the remat
        # primitive is really in the traced step
        from shadow_removal_istd_tpu.engine.steps import (
            _unjitted_train_step,
        )
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0)
        cfg_r = tiny_cfg(lambda4=0.0, lambda5=0.0, remat=True)
        models, state = setup(cfg)
        batch = make_batch()
        k = jax.random.key(0)
        plain = str(jax.make_jaxpr(_unjitted_train_step(models, cfg))(
            state, batch, k))
        remat = str(jax.make_jaxpr(_unjitted_train_step(models, cfg_r))(
            state, batch, k))
        assert "remat" not in plain
        assert "remat" in remat

    def test_remat_step_matches_plain_step(self):
        # smoothed Adam eps: at the default 1e-8 the first update is
        # ~lr*sign(g), so remat's fp reassociation flips near-zero
        # gradient signs into 2*lr param noise (same rationale as the
        # reference-parity suites); eps=1e-3 isolates real differences
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, adam_eps=1e-3)
        cfg_r = tiny_cfg(lambda4=0.0, lambda5=0.0, adam_eps=1e-3,
                         remat=True)
        batch = make_batch()
        k = jax.random.key(3)
        # the jitted step donates the state buffer — build a fresh
        # (identical, same-key) state for each run
        models, state = setup(cfg)
        plain = make_train_step(models, cfg)(state, batch, k)
        models_r, state_r = setup(cfg)
        remat = make_train_step(models_r, cfg_r)(state_r, batch, k)
        for (s1, m1), (s2, m2) in [(plain, remat)]:
            for key in ("G", "D", "data1", "data2"):
                np.testing.assert_allclose(
                    float(m1[key]), float(m2[key]), atol=1e-6, rtol=1e-6)
            # the remat graph refuses differently, so recomputed
            # activations reassociate at fp32 round-off; a real
            # semantic difference would show at the O(lr)=5e-4 level
            for a, b in zip(jax.tree.leaves(s1.g_params),
                            jax.tree.leaves(s2.g_params)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-6)
            for a, b in zip(jax.tree.leaves(s1.d_params),
                            jax.tree.leaves(s2.d_params)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=5e-6)


class TestPipelineInfer:
    """RunConfig.pipeline_infer routes Trainer.infer through the
    two-stage StackedPipeline (G1 on one device group, G2 on the
    other) and must produce the same PNGs as the fused path."""

    def _run(self, tmp_path, tag, pipeline):
        from shadow_removal_istd_tpu.data.synthetic import (
            synthetic_triplets,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        data = synthetic_triplets(4, SIZE, SIZE, seed=0)
        streams = {k: data[k] for k in ("img", "matte", "target")}
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, droprate=0.0)
        run = RunConfig(logs_dir=str(tmp_path / f"l{tag}"),
                        weights_dir=str(tmp_path / f"w{tag}"),
                        infered_dir=str(tmp_path / f"o{tag}"),
                        checkpoint_path=str(tmp_path / f"c{tag}.msgpack"),
                        pipeline_infer=pipeline, preempt_save=False)
        tr = Trainer(cfg, run, train_streams=streams,
                     valid_streams=streams,
                     valid_names=[f"f{i}" for i in range(4)])
        assert tr.infer() == 4
        return str(tmp_path / f"o{tag}")

    def test_matches_fused_path(self, tmp_path):
        import os

        from shadow_removal_istd_tpu.utils.image_io import imread_color
        fused = self._run(tmp_path, "a", pipeline=False)
        piped = self._run(tmp_path, "b", pipeline=True)
        for sub in ("shadowless", "matte"):
            for i in range(4):
                a = imread_color(os.path.join(fused, sub, f"f{i}.png"))
                b = imread_color(os.path.join(piped, sub, f"f{i}.png"))
                # identical weights (same seed init, no training):
                # outputs agree to a quantization step
                np.testing.assert_allclose(
                    a.astype(np.int16), b.astype(np.int16), atol=1)

    def test_pipeline_respects_mesh_device_selection(self, tmp_path,
                                                     monkeypatch):
        """--devices confines the pipeline too: StackedPipeline must
        split the trainer's mesh devices, never claim chips the user
        excluded (e.g. --devices 2 on an 8-chip host)."""
        from shadow_removal_istd_tpu.data.synthetic import (
            synthetic_triplets,
        )
        from shadow_removal_istd_tpu.engine.loop import RunConfig, Trainer
        from shadow_removal_istd_tpu.parallel import mesh as mesh_mod
        from shadow_removal_istd_tpu.parallel import pipeline as pipe_mod

        selected = jax.devices()[:2]
        captured = {}
        orig = pipe_mod.StackedPipeline.__init__

        def spy(self, models, g_params, batch_stats, devices=None,
                depth=2):
            captured["devices"] = devices
            orig(self, models, g_params, batch_stats, devices=devices,
                 depth=depth)

        monkeypatch.setattr(pipe_mod.StackedPipeline, "__init__", spy)
        data = synthetic_triplets(4, SIZE, SIZE, seed=0)
        streams = {k: data[k] for k in ("img", "matte", "target")}
        cfg = tiny_cfg(lambda4=0.0, lambda5=0.0, droprate=0.0)
        run = RunConfig(logs_dir=str(tmp_path / "l"),
                        weights_dir=str(tmp_path / "w"),
                        infered_dir=str(tmp_path / "o"),
                        checkpoint_path=str(tmp_path / "c.msgpack"),
                        pipeline_infer=True, preempt_save=False)
        tr = Trainer(cfg, run, train_streams=streams,
                     valid_streams=streams,
                     valid_names=[f"f{i}" for i in range(4)],
                     mesh=mesh_mod.make_mesh(selected))
        assert tr.infer() == 4
        assert captured["devices"] == selected
