"""Fused-epoch (one-dispatch) training path tests."""
import numpy as np

import jax
import jax.numpy as jnp

from shadow_removal_istd_tpu.data.device_cache import DeviceDatasetCache
from shadow_removal_istd_tpu.data.synthetic import synthetic_triplets
from shadow_removal_istd_tpu.engine import (
    TrainConfig,
    build_models,
    init_state,
)
from shadow_removal_istd_tpu.engine.epoch import make_scanned_epoch


def _setup(n=8, batch=4):
    cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=batch,
                      use_visual_loss=False, droprate=0.0,
                      steps_per_epoch=n // batch)
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models)
    data = synthetic_triplets(n, 48, 64, seed=0)
    streams = {k: data[k] for k in ("img", "matte", "target")}
    cache = DeviceDatasetCache(streams)
    return cfg, models, state, cache


class TestScannedEpoch:
    def test_epoch_advances_steps_and_sums_metrics(self):
        cfg, models, state, cache = _setup()
        epoch_fn = make_scanned_epoch(models, cfg)
        idx = cache.epoch_indices(jax.random.key(1), cfg.batch_size)
        assert idx.shape == (2, 4)
        state, sums = epoch_fn(state, cache._arrays, idx,
                               jax.random.key(2), 1.0, 1.0)
        assert int(state.step) == 2
        for k, v in jax.device_get(sums).items():
            assert np.isfinite(float(v)), k

    def test_epoch_losses_decrease_over_epochs(self):
        # dummy D = pure supervised (adversarial dynamics don't
        # monotonically reduce the data losses over a few tiny epochs)
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=4,
                          net_d="dummy", use_visual_loss=False,
                          droprate=0.0, steps_per_epoch=2)
        models = build_models(cfg)
        state = init_state(jax.random.key(0), cfg, models)
        data = synthetic_triplets(8, 48, 64, seed=0)
        streams = {k: data[k] for k in ("img", "matte", "target")}
        cache = DeviceDatasetCache(streams)
        epoch_fn = make_scanned_epoch(models, cfg)
        firsts, lasts = None, None
        for e in range(6):
            idx = cache.epoch_indices(jax.random.key(10 + e),
                                      cfg.batch_size)
            state, sums = epoch_fn(state, cache._arrays, idx,
                                   jax.random.key(20 + e), 1.0, 1.0)
            g = float(sums["data1"]) + float(sums["data2"])
            if firsts is None:
                firsts = g
            lasts = g
        assert lasts < firsts

    def test_shuffle_differs_per_epoch_key(self):
        _, _, _, cache = _setup()
        i1 = np.asarray(cache.epoch_indices(jax.random.key(1), 4))
        i2 = np.asarray(cache.epoch_indices(jax.random.key(2), 4))
        assert not np.array_equal(i1, i2)
        # each epoch covers distinct samples (permutation property)
        assert len(np.unique(i1)) == i1.size

    def test_epoch_on_mesh_shards_batch_and_matches(self):
        """The mesh-constrained fused epoch must (a) actually shard the
        per-step batch across the data axis — without the constraint a
        replicated cache keeps the whole epoch replicated — and (b)
        reproduce the single-device epoch numerically."""
        from shadow_removal_istd_tpu.parallel import (
            make_mesh,
            replicated_sharding,
            shard_state,
        )

        cfg, models, state, _ = _setup(n=16, batch=8)
        data = synthetic_triplets(16, 48, 64, seed=0)
        streams = {k: data[k] for k in ("img", "matte", "target")}

        epoch_single = make_scanned_epoch(models, cfg)
        cache_s = DeviceDatasetCache(streams)
        idx = cache_s.epoch_indices(jax.random.key(1), cfg.batch_size)
        s_single, sums_single = epoch_single(
            state, cache_s._arrays, idx, jax.random.key(2), 1.0, 1.0)

        mesh = make_mesh()
        state_m = shard_state(
            mesh, init_state(jax.random.key(0), cfg, models))
        cache_m = DeviceDatasetCache(streams, replicated_sharding(mesh))
        epoch_mesh = make_scanned_epoch(models, cfg, mesh=mesh)
        s_mesh, sums_mesh = epoch_mesh(
            state_m, cache_m._arrays,
            jax.device_put(idx, replicated_sharding(mesh)),
            jax.random.key(2), 1.0, 1.0)

        assert int(s_mesh.step) == int(s_single.step) == 2
        np.testing.assert_allclose(float(sums_mesh["G"]),
                                   float(sums_single["G"]), rtol=2e-4)
        np.testing.assert_allclose(float(sums_mesh["D"]),
                                   float(sums_single["D"]), rtol=2e-4)

    def test_trainer_fused_matches_interface(self, tmp_path):
        from shadow_removal_istd_tpu.engine import RunConfig, Trainer
        # 64x64: MNet validates at native resolution, which must be
        # divisible by 2^(depth+1) (same constraint as the reference)
        data = synthetic_triplets(8, 64, 64, seed=0)
        streams = {k: data[k] for k in ("img", "matte", "target")}
        cfg = TrainConfig(ngf=4, ndf=4, image_size=32, batch_size=4,
                          use_visual_loss=False, droprate=0.0)
        run = RunConfig(logs_dir=str(tmp_path / "l"),
                        weights_dir=str(tmp_path / "w"),
                        infered_dir=str(tmp_path / "o"),
                        checkpoint_path=str(tmp_path / "c.msgpack"),
                        log_every=1, valid_every=1, vis_every=1,
                        save_every=2, device_cache=True)
        tr = Trainer(cfg, run, train_streams=streams,
                     valid_streams=streams)
        assert tr.epoch_fn is not None
        tr.train(2)
        assert int(tr.state.step) == 4  # 2 epochs x 2 steps
        import os
        assert os.path.isfile(
            os.path.join(str(tmp_path / "w"), "G1_MNet_latest.msgpack"))


class TestFusedEpochTensorParallel:
    """--device-cache composes with --model-shard: the one-dispatch
    scanned epoch must stay exact when the state is channel-sharded
    over a (data x model) mesh (batches shard on data only, as in
    train_batch_sharding)."""

    def test_fused_epoch_on_tp_mesh_matches_single_device(self):
        from shadow_removal_istd_tpu.parallel import (
            make_mesh_tp,
            replicated_sharding,
            shard_state,
        )

        cfg, models, state, _ = _setup(n=16, batch=8)
        data = synthetic_triplets(16, 48, 64, seed=0)
        streams = {k: data[k] for k in ("img", "matte", "target")}

        epoch_single = make_scanned_epoch(models, cfg)
        cache_s = DeviceDatasetCache(streams)
        idx = cache_s.epoch_indices(jax.random.key(1), cfg.batch_size)
        s_single, sums_single = epoch_single(
            state, cache_s._arrays, idx, jax.random.key(2), 1.0, 1.0)

        mesh = make_mesh_tp(2, 4)
        state_tp = shard_state(
            mesh, init_state(jax.random.key(0), cfg, models))
        cache_tp = DeviceDatasetCache(streams, replicated_sharding(mesh))
        epoch_tp = make_scanned_epoch(models, cfg, mesh=mesh)
        s_tp, sums_tp = epoch_tp(
            state_tp, cache_tp._arrays,
            jax.device_put(idx, replicated_sharding(mesh)),
            jax.random.key(2), 1.0, 1.0)

        assert int(s_tp.step) == int(s_single.step) == 2
        np.testing.assert_allclose(float(sums_tp["G"]),
                                   float(sums_single["G"]), rtol=2e-4)
        np.testing.assert_allclose(float(sums_tp["D"]),
                                   float(sums_single["D"]), rtol=2e-4)
        # the sharded trailing dims survived the scan: weights remain
        # split across the model axis afterwards
        k = s_tp.g_params["g1"]["_Down_1"]["ConvReflect_0"]["Conv_0"][
            "kernel"]
        assert {s.data.shape[-1] for s in k.addressable_shards} == {
            k.shape[-1] // 4}
