"""Trainer: epoch loops, validation, best-model tracking, inference.

The runtime equivalent of the reference's ``CGAN`` engine
(src/cgan.py:28-464), re-built around the jitted steps:

- host pipeline ships full-resolution uint8 batches; the fused
  augmentation kernel (scale/rotate/flip/crop/normalize in one gather)
  runs on device in the same jit as the training step's inputs;
- validation every ``valid_every`` epochs with best-model selection on
  0.8*G + 0.2*D (src/cgan.py:220-229, 399);
- TensorBoard scalars (Loss/*, D1_output/*, D2_output/*) every
  ``log_every`` epochs and image grids every ``vis_every``
  (src/cgan.py:386-412), via tensorboardX;
- per-network weight files + full-state checkpointing. The reference's
  inverted save condition (``if epoch % save_interval:`` saves on
  NON-multiples, src/cgan.py:230-231) is fixed here.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from shadow_removal_istd_tpu.data.istd import ISTDDataset
from shadow_removal_istd_tpu.data.pipeline import BatchPipeline
from shadow_removal_istd_tpu.engine import checkpoint as ckpt
from shadow_removal_istd_tpu.engine.config import TrainConfig
from shadow_removal_istd_tpu.engine.state import (
    Models,
    TrainState,
    build_models,
    init_state,
)
from shadow_removal_istd_tpu.engine.steps import (
    make_eval_step,
    make_infer_step,
    make_train_step,
)
from shadow_removal_istd_tpu.ops.augment import (
    AugmentConfig,
    augment_batch,
    denormalize,
    float_to_uint8,
    normalize_batch,
)
from shadow_removal_istd_tpu.parallel.mesh import (
    is_primary,
    put_global,
    shard_state,
)
from shadow_removal_istd_tpu.utils.image_io import imwrite

logger = logging.getLogger(__name__)

_METRIC_KEYS = ("G", "G1", "G2", "D", "D1", "D2",
                "data1", "data2", "vis1", "vis2")


@dataclass
class RunConfig:
    """Run-level knobs (paths, intervals) — the non-model CLI surface."""

    data_dirs: tuple[str, ...] = ()
    data_h5: str | None = None  # HDF5 dataset file (data/h5.py layout);
    # takes precedence over data_dirs when set
    logs_dir: str = "./logs"
    weights_dir: str = "./weights"
    infered_dir: str = "./infered"
    checkpoint_path: str = "./checkpoint.msgpack"
    # "msgpack" (single file, synchronous) or "orbax" (directory of
    # step_N checkpoints, ASYNC commit — the epoch loop continues while
    # orbax serializes in the background; for orbax, checkpoint_path
    # names the backend directory)
    checkpoint_backend: str = "msgpack"
    log_every: int = 3
    valid_every: int = 10
    vis_every: int = 50
    save_every: int = 50
    seed: int = 38107943
    vgg_weights: str | None = None
    allow_missing_vgg: bool = False  # warn instead of failing when the
    # visual-loss lambdas are nonzero but no VGG weights are available
    tasks: tuple[str, ...] = ("train",)
    # run whole epochs as ONE device dispatch over the HBM-resident
    # dataset (engine/epoch.py); ~10s/epoch saved on tunneled hosts
    device_cache: bool = False
    # jax.profiler trace directory (None = off); traces the first
    # post-warmup training epoch for TensorBoard/XProf
    profile_dir: str | None = None
    # checkpoint + clean exit on SIGTERM at the next epoch boundary
    # (preemptible TPU VMs deliver SIGTERM before eviction)
    preempt_save: bool = True
    # compute the ISTD LAB-RMSE/MAE eval protocol (the paper metric,
    # reference src/eval.py) on the validation split every valid-every
    # epochs and log Eval/* scalars — the reference only tracks losses
    # during training and defers the real metric to the offline CLI
    eval_metrics: bool = False
    # two-stage pipeline-parallel inference (parallel.pipeline): G1 on
    # one device group, G2 on the other, matte handed over between
    # stages; halves per-device weight bytes vs the replicated layout
    pipeline_infer: bool = False


class Trainer:
    def __init__(self, cfg: TrainConfig, run: RunConfig,
                 mesh=None,
                 train_streams: dict | None = None,
                 valid_streams: dict | None = None,
                 valid_names: list[str] | None = None):
        """``train_streams``/``valid_streams`` allow injecting data
        directly (tests, benchmarks); otherwise ISTD directories from
        ``run.data_dirs`` are loaded (reference src/cgan.py:98-121)."""
        self.cfg = cfg
        self.run = run
        self.mesh = mesh
        # multi-host: host-side side effects (TensorBoard, checkpoint
        # files, weight files) belong to process 0; every process runs
        # the same device program (collectives are SPMD) and loads the
        # same data, so the computation is identical everywhere
        self._primary = is_primary()
        self.rng = jax.random.PRNGKey(run.seed)
        # Training randomness (shuffle order, augment draws, dropout) is
        # a PURE function of (seed, epoch, step) via fold_in from this
        # base — never of how many times self.rng was split before. A
        # run resumed from a checkpoint at epoch N therefore sees the
        # exact randomness the uninterrupted run saw (the reference
        # cannot: torch RNG state is not in its checkpoint.tar,
        # src/cgan.py:490-509). fold_in(1) domain-separates from the
        # init-time split() chain of self.rng.
        self._epoch_base = jax.random.fold_in(self.rng, 1)

        # whether validation data comes from run's own loaders below —
        # the eval-metrics mask stream may only be loaded from the same
        # source, never paired with caller-injected streams
        streams_injected = (train_streams is not None
                            or valid_streams is not None)
        if train_streams is None and (run.data_h5 or run.data_dirs):
            loader = self._load_h5 if run.data_h5 else self._load_dirs
            train_streams, loaded_valid, loaded_names = loader()
            # caller-injected validation streams take precedence over
            # the source's test split — never silently clobber them
            if valid_streams is None:
                valid_streams, valid_names = loaded_valid, loaded_names
        self.valid_names = valid_names or []

        self.train_pipe = None
        self.valid_pipe = None
        steps_per_epoch = 1
        if train_streams:
            self.train_pipe = BatchPipeline(
                train_streams, cfg.batch_size, shuffle=True, drop_last=True,
                seed=run.seed)
            steps_per_epoch = max(len(self.train_pipe), 1)
        if valid_streams:
            # Multi-host runs must not hit _place's single-device
            # fallback (a process-local array cannot mix with the
            # globally-sharded state inside one jit), so the ragged
            # final validation batch is dropped there. Single-process
            # keeps every sample, like the reference.
            drop_ragged = jax.process_count() > 1
            n_valid = next(iter(valid_streams.values())).shape[0]
            if drop_ragged and n_valid % cfg.batch_size:
                logger.warning(
                    "multi-host validation drops the ragged final "
                    "batch (%d of %d samples)",
                    n_valid % cfg.batch_size, n_valid)
            self.valid_pipe = BatchPipeline(
                valid_streams, cfg.batch_size, shuffle=False,
                drop_last=drop_ragged, seed=run.seed)

        # cfg is frozen; rebuild with the actual steps/epoch so the lr
        # schedule decays once per epoch like the reference's scheduler.
        self.cfg = TrainConfig(**{**cfg.__dict__,
                                  "steps_per_epoch": steps_per_epoch})

        self.models: Models = build_models(self.cfg)
        self.rng, init_key = jax.random.split(self.rng)
        self.state: TrainState = init_state(init_key, self.cfg, self.models)
        if self.cfg.dcgan_init:
            # the legacy tree applies DCGAN init when no weights are
            # loaded (reference STCGAN/stcgan.py:408-433)
            from shadow_removal_istd_tpu.models.layers import (
                apply_dcgan_init,
            )
            self.rng, k1, k2 = jax.random.split(self.rng, 3)
            bn_mean = 0.0 if self.cfg.dcgan_bn_compat else 1.0
            self.state = self.state.replace(
                g_params=apply_dcgan_init(k1, self.state.g_params, bn_mean),
                d_params=apply_dcgan_init(k2, self.state.d_params, bn_mean))
        if mesh is not None:
            self.state = shard_state(mesh, self.state)

        # legacy ReduceLROnPlateau controllers (host-side)
        self.plateau_g = self.plateau_d = None
        if self.cfg.lr_schedule == "plateau":
            from shadow_removal_istd_tpu.engine.schedules import (
                ReduceLROnPlateau,
            )
            self.plateau_g = ReduceLROnPlateau(self.cfg.lr_g)
            self.plateau_d = ReduceLROnPlateau(self.cfg.lr_d)

        vgg_vars = None
        if run.vgg_weights:
            if not os.path.isfile(run.vgg_weights):
                raise FileNotFoundError(
                    f"--vgg-weights {run.vgg_weights!r} does not exist")
            from shadow_removal_istd_tpu.models.vgg import load_vgg_variables
            vgg_vars = load_vgg_variables(run.vgg_weights)
        elif (cfg.use_visual_loss and (cfg.lambda4 or cfg.lambda5)
              and "train" in run.tasks):
            # The reference always trains with the VGG perceptual terms
            # (lambda4=5, lambda5=50 defaults, src/main.py:216-236).
            # Without converted weights the objective would silently
            # differ, so fail fast unless explicitly overridden.
            msg = (
                f"visual loss weights lambda4={cfg.lambda4}/"
                f"lambda5={cfg.lambda5} are nonzero but no VGG weights "
                "were given — convert once with tools/convert_vgg.py and "
                "pass --vgg-weights, or set --lambda4 0 --lambda5 0, or "
                "pass --allow-missing-vgg to train WITHOUT the "
                "perceptual terms")
            if not run.allow_missing_vgg:
                raise ValueError(msg)
            logger.warning("%s (continuing without them)", msg)
        self.vgg_vars = vgg_vars

        self.train_step = make_train_step(self.models, self.cfg, vgg_vars)
        self.eval_step = make_eval_step(self.models, self.cfg, vgg_vars,
                                        return_preds=True)
        self.infer_step = make_infer_step(self.models)
        if mesh is not None:
            from shadow_removal_istd_tpu.parallel.mesh import (
                MODEL_AXIS,
                SPATIAL_AXIS,
                gather_model_leaves,
            )
            if (mesh.shape.get(SPATIAL_AXIS, 1) > 1
                    and mesh.shape.get(MODEL_AXIS, 1) > 1):
                # Composed (data x spatial x model) mesh: forward
                # batches are row-sharded AND state is channel-sharded,
                # a combination XLA miscompiles in windowed convs (see
                # gather_model_leaves). Forward steps therefore
                # all-gather state at use (ZeRO-3 semantics — storage
                # stays sharded); the train step is unaffected (train
                # batches are data-sharded only, and data x model is
                # exact).
                base_infer, base_eval = self.infer_step, self.eval_step
                self.infer_step = jax.jit(lambda p, s, x: base_infer(
                    gather_model_leaves(mesh, p),
                    gather_model_leaves(mesh, s), x))
                self.eval_step = jax.jit(lambda st, b: base_eval(
                    gather_model_leaves(mesh, st), b))
        from shadow_removal_istd_tpu.ops.pallas_shear import (
            should_interpret,
        )
        self.aug_cfg = AugmentConfig(
            scale=self.cfg.aug_scale, angle=self.cfg.aug_angle,
            flip_prob=0.5, crop_size=self.cfg.image_size,
            resize=self.cfg.aug_resize, method=self.cfg.aug_method,
            pallas_interpret=should_interpret(
                mesh.devices.flat if mesh is not None else None))
        self._augment = jax.jit(
            lambda k, s: augment_batch(k, s, self.aug_cfg))

        valid_resize = self.cfg.valid_resize

        def _norm(streams):
            if valid_resize is not None:
                from shadow_removal_istd_tpu.ops.resize import resize
                streams = tuple(
                    resize(s.astype(jnp.float32), valid_resize)
                    for s in streams)
            return normalize_batch(streams)

        self._normalize = jax.jit(_norm)

        self.epoch_fn = None
        self._cache = None
        if run.device_cache and train_streams:
            from shadow_removal_istd_tpu.data.device_cache import (
                DeviceDatasetCache,
            )
            from shadow_removal_istd_tpu.engine.epoch import (
                make_scanned_epoch,
            )
            sharding = None
            if mesh is not None:
                from shadow_removal_istd_tpu.parallel.mesh import (
                    replicated_sharding,
                )
                sharding = replicated_sharding(mesh)
            self._cache = DeviceDatasetCache(train_streams, sharding)
            self.epoch_fn = make_scanned_epoch(self.models, self.cfg,
                                               vgg_vars, mesh=mesh)

        self.start_epoch = 0
        self.best_loss = float("inf")
        self.preempted = False
        self._orbax = None  # lazy long-lived async checkpointer
        self._writers: dict = {}
        self._lab_parts_fn = None
        # binary shadow-mask stream for the in-training eval protocol
        # (reference src/eval.py:67-70 uses the mask dir, not the
        # matte); loaded separately for the validation split when the
        # training streams don't already include it
        self._valid_masks = None
        if (run.eval_metrics and "mask" not in self.cfg.train_datas
                and streams_injected):
            # masks from run.data_h5/data_dirs would be ordered against
            # a DIFFERENT validation set than the injected one — wrong
            # metrics at best, a mid-validation shape mismatch at worst
            logger.warning(
                "--eval-metrics with injected validation streams: no "
                "aligned mask stream; Eval scalars use the matte proxy "
                "(tagged EvalProxy/*)")
        elif run.eval_metrics and "mask" not in self.cfg.train_datas:
            if run.data_h5:
                from shadow_removal_istd_tpu.data.h5 import ISTDH5Dataset
                try:
                    self._valid_masks = ISTDH5Dataset(
                        run.data_h5, "test").load_streams(
                            ("mask",))["mask"]
                except KeyError:
                    # reference-layout h5 (no mask dataset): proxy path
                    logger.warning(
                        "--eval-metrics: HDF5 file carries no mask "
                        "stream; Eval scalars fall back to the matte "
                        "proxy (tagged EvalProxy/*)")
            elif run.data_dirs:
                try:
                    parts = []
                    for d in run.data_dirs:
                        ds = ISTDDataset(d, "test", datas=("mask",))
                        parts.append(ds.load_all()["mask"])
                    self._valid_masks = np.concatenate(parts)
                except FileNotFoundError:
                    # dataset without a binary test_B mask directory:
                    # degrade to the matte proxy like the h5 branch,
                    # don't kill the run at startup
                    logger.warning(
                        "--eval-metrics: no binary mask directory "
                        "(test_B) found under %s; Eval scalars fall "
                        "back to the matte proxy (tagged EvalProxy/*)",
                        run.data_dirs)

    # ------------------------------------------------------------ data
    def _load_h5(self):
        """Bulk-load train/valid streams from the HDF5 dataset
        (reference STCGAN/dataset_h5.py layout + our matte extension):
        one read per stream -> host arrays -> the same device-cache /
        fused-epoch path as the directory loader."""
        from shadow_removal_istd_tpu.data.h5 import ISTDH5Dataset

        datas = tuple(self.cfg.train_datas)
        tr = ISTDH5Dataset(self.run.data_h5, "train")
        va = ISTDH5Dataset(self.run.data_h5, "test")
        train = tr.load_streams(datas)
        valid = va.load_streams(datas)
        return train, valid, va.filenames()

    def _load_dirs(self):
        train_parts, valid_parts, names = [], [], []
        datas = self.cfg.train_datas
        for d in self.run.data_dirs:
            name = os.path.basename(os.path.normpath(d))
            tr = ISTDDataset(d, "train", datas=datas, name=name)
            va = ISTDDataset(d, "test", datas=datas, name=name)
            train_parts.append(tr.load_all())
            valid_parts.append(va.load_all())
            names.extend(va.filename(i) for i in range(len(va)))
        keys = train_parts[0].keys()
        train = {k: np.concatenate([p[k] for p in train_parts]) for k in keys}
        valid = {k: np.concatenate([p[k] for p in valid_parts]) for k in keys}
        return train, valid, names

    def _writer(self, which: str):
        if which not in self._writers:
            if not self._primary:
                self._writers[which] = _NullWriter()
            else:
                from tensorboardX import SummaryWriter
                self._writers[which] = SummaryWriter(
                    os.path.join(self.run.logs_dir, which))
        return self._writers[which]

    def _save_weights(self, suffix: str) -> None:
        """Per-net weight files — process 0 only under multi-host (the
        state is replicated; N processes writing the same bytes to the
        same path is at best redundant, at worst a torn file)."""
        if self._primary:
            ckpt.save_model_weights(self.state, self.models,
                                    self.run.weights_dir, suffix)

    def _place(self, batch, train: bool = False):
        if self.mesh is not None:
            from shadow_removal_istd_tpu.parallel.mesh import (
                DATA_AXIS,
                image_sharding,
                train_batch_sharding,
            )
            from shadow_removal_istd_tpu.parallel.mesh import SPATIAL_AXIS
            n = batch[0].shape[0]
            if n % self.mesh.shape.get(DATA_AXIS, 1) == 0:
                # batch over "data". Forward-only batches (valid/infer)
                # additionally shard image H rows over the "spatial"
                # axis when the mesh has one (GSPMD conv halo exchange)
                # — the latency-scaling axis for full-resolution
                # inference. Training batches stay data-only: see
                # train_batch_sharding's docstring (Shardy backward
                # miscompilation guard). Row-sharding also requires H
                # divisible by the spatial axis size; otherwise fall
                # back to data-only rather than crash in device_put.
                h = batch[0].shape[1]
                spatial_ok = h % self.mesh.shape.get(SPATIAL_AXIS, 1) == 0
                if (not train and not spatial_ok
                        and self.mesh.shape.get(SPATIAL_AXIS, 1) > 1
                        and not getattr(self, "_warned_spatial", False)):
                    self._warned_spatial = True
                    logger.warning(
                        "--spatial-shard %d does not divide image "
                        "height %d; falling back to data-only "
                        "sharding (no spatial latency scaling)",
                        self.mesh.shape[SPATIAL_AXIS], h)
                sharding = (train_batch_sharding(self.mesh)
                            if train or not spatial_ok
                            else image_sharding(self.mesh))
                return jax.tree.map(
                    lambda a: put_global(sharding, a), batch)
            # ragged final validation batch: single-device fallback
            # (multi-host never reaches this — the valid pipe drops the
            # ragged batch, see __init__)
        return jax.tree.map(jnp.asarray, batch)

    # ----------------------------------------------------------- train
    def train(self, epochs: int):
        assert self.train_pipe is not None, "no training data"
        from shadow_removal_istd_tpu.utils.preemption import (
            PreemptionGuard,
        )
        from shadow_removal_istd_tpu.utils.profiling import StepTimer, trace
        timer = StepTimer()
        t_start = time.time()
        guard = PreemptionGuard() if self.run.preempt_save else None
        with guard or contextlib.nullcontext():
            # guard is live before this line prints: a SIGTERM any time
            # after "start training" is guaranteed a clean checkpoint
            logger.info("start training: %d epochs, %d steps/epoch",
                        epochs, len(self.train_pipe))
            for epoch in range(self.start_epoch, epochs):
                # profile the second epoch (first is compile-dominated)
                profile_now = (self.run.profile_dir
                               and epoch == self.start_epoch + 1)
                with trace(self.run.profile_dir if profile_now else None):
                    self.run_train_epoch(
                        epoch,
                        log_scalars=epoch % self.run.log_every == 0,
                        visualize=epoch % self.run.vis_every == 0)
                timer.update(len(self.train_pipe) * self.cfg.batch_size)
                if epoch % self.run.log_every == 0:
                    self._writer("train").add_scalar(
                        "perf/images_per_sec", timer.rate(), epoch)
                    timer.reset()
                if epoch % self.run.valid_every == 0 and self.valid_pipe:
                    total = self.run_valid_epoch(epoch)
                    if total < self.best_loss:
                        self.best_loss = total
                        self._save_weights("best")
                        logger.info(
                            "improvement after epoch %d, error=%.4f",
                            epoch, total)
                if guard is not None and guard.requested:
                    # epoch + 1: this epoch is complete — resume must
                    # continue with the NEXT one, not replay it
                    self.save(epoch + 1)
                    self._save_weights("latest")
                    logger.warning(
                        "preemption checkpoint written after epoch %d "
                        "(%s); resume with --load-checkpoint",
                        epoch, self.run.checkpoint_path)
                    self.preempted = True
                    break
                if epoch % self.run.save_every == 0:
                    # epoch + 1, same as the preemption save: the epoch
                    # is complete, resume continues with the next one
                    self.save(epoch + 1)
        self._drain_async_saves()
        logger.info("training time %.1fs; best validation loss %.3f",
                    time.time() - t_start, self.best_loss)
        return self.preempted

    def run_train_epoch(self, epoch: int, log_scalars: bool = False,
                        visualize: bool = False):
        if self.epoch_fn is not None:
            return self._run_train_epoch_fused(epoch, log_scalars,
                                               visualize)
        # metric collection is for scalar logging / the plateau
        # scheduler only; a visualize-only epoch just needs one batch
        need_sums = log_scalars or self.plateau_g is not None
        collected = []  # lazy device arrays; one device_get at epoch end
        vis_batch = None
        scale_g = self.plateau_g.scale if self.plateau_g else 1.0
        scale_d = self.plateau_d.scale if self.plateau_d else 1.0
        ekey = jax.random.fold_in(self._epoch_base, epoch)
        for step, raw in enumerate(self.train_pipe.epoch(epoch)):
            k_aug, k_step = jax.random.split(
                jax.random.fold_in(ekey, step))
            batch = self._augment(k_aug, self._place(raw, train=True))
            self.state, metrics = self.train_step(
                self.state, batch, k_step, scale_g, scale_d)
            if need_sums:
                collected.append(metrics)
            if visualize and vis_batch is None:
                vis_batch = batch
        n = len(collected)
        if need_sums and n:
            got = jax.device_get(collected)
            sums = {k: float(np.sum([m[k] for m in got]))
                    for k in _METRIC_KEYS}
            outs = {k: float(np.sum([m[k] for m in got]))
                    for k in ("D1_real", "D1_fake", "D2_real", "D2_fake")}
            if self.plateau_g is not None:
                # the legacy scheduler steps on the SUMMED epoch losses
                # (reference STCGAN/stcgan.py:315-317 steps before the
                # per-batch normalization)
                self.plateau_g.step(sums["G"])
                self.plateau_d.step(sums["D"])
            if log_scalars:
                self._log_scalars("train", epoch, sums, outs, n)
                self._save_weights("latest")
        if visualize and vis_batch is not None:
            self._log_images("train", epoch, vis_batch)

    def _run_train_epoch_fused(self, epoch: int, log_scalars: bool,
                               visualize: bool):
        """One-dispatch epoch over the HBM-resident dataset."""
        ekey = jax.random.fold_in(self._epoch_base, epoch)
        k_idx, k_epoch = jax.random.split(ekey)
        idx = self._cache.epoch_indices(k_idx, self.cfg.batch_size)
        if jax.process_count() > 1:
            # the permutation is computed from the shared seed on every
            # process (identical values), but lands as a process-LOCAL
            # array; re-place it replicated over the global mesh so it
            # can enter the jitted epoch next to the global state
            from shadow_removal_istd_tpu.parallel.mesh import (
                replicated_sharding,
            )
            idx = put_global(replicated_sharding(self.mesh),
                             jax.device_get(idx))
        n = idx.shape[0]
        scale_g = self.plateau_g.scale if self.plateau_g else 1.0
        scale_d = self.plateau_d.scale if self.plateau_d else 1.0
        self.state, sums_dev = self.epoch_fn(
            self.state, self._cache._arrays, idx, k_epoch,
            scale_g, scale_d)
        if log_scalars or visualize or self.plateau_g is not None:
            got = jax.device_get(sums_dev)
            sums = {k: float(got[k]) for k in _METRIC_KEYS}
            outs = {k: float(got[k]) for k in
                    ("D1_real", "D1_fake", "D2_real", "D2_fake")}
            if self.plateau_g is not None:
                self.plateau_g.step(sums["G"])
                self.plateau_d.step(sums["D"])
            if log_scalars:
                self._log_scalars("train", epoch, sums, outs, n)
                self._save_weights("latest")
        if visualize:
            raw = self._cache.gather(idx[0])
            # visualization-only draw; step index 1<<20 cannot collide
            # with a real step's fold_in
            k_aug = jax.random.fold_in(ekey, 1 << 20)
            batch = self._augment(k_aug, raw)
            self._log_images("train", epoch, batch)

    def run_valid_epoch(self, epoch: int) -> float:
        sums = {k: 0.0 for k in _METRIC_KEYS}
        outs = {"D1_real": 0.0, "D1_fake": 0.0,
                "D2_real": 0.0, "D2_fake": 0.0}
        totals, n = 0.0, 0
        vis_batch = None
        lab_parts = []
        ofs = 0
        for raw in self.valid_pipe.epoch():
            n_b = raw[0].shape[0]
            batch = self._normalize(self._place(raw))
            metrics, preds = self.eval_step(self.state, batch)
            if self.run.eval_metrics:
                # reuse eval_step's y_pred — no second G forward
                mask = self._protocol_mask(batch[1], ofs, n_b)
                lab_parts.append(self._lab_parts(preds[1], batch[2],
                                                 mask))
            ofs += n_b
            metrics = jax.device_get(metrics)
            for k in _METRIC_KEYS:
                sums[k] += float(metrics[k])
            for k in outs:
                outs[k] += float(metrics[k])
            totals += float(metrics["total"])
            n += 1
            if vis_batch is None:
                vis_batch = batch
        if n:
            self._log_scalars("valid", epoch, sums, outs, n)
            if lab_parts:
                from shadow_removal_istd_tpu.metrics.metrics import (
                    aggregate_regions,
                )
                agg = aggregate_regions(jax.device_get(lab_parts))
                # real binary-mask stream -> the actual paper protocol
                # (Eval/*); matte-threshold fallback is only a PROXY
                # for it and is tagged so in TensorBoard
                tag = ("Eval" if self._has_protocol_masks()
                       else "EvalProxy")
                w = self._writer("valid")
                for k in ("rmse", "rmse_non", "rmse_all",
                          "mae", "mae_non", "mae_all"):
                    w.add_scalar(f"{tag}/{k}", agg[k], epoch)
                w.flush()
                logger.info(
                    "eval protocol%s @ epoch %d: RMSE shadow %.2f / "
                    "non-shadow %.2f / all %.2f",
                    "" if tag == "Eval" else " (matte proxy)", epoch,
                    agg["rmse"], agg["rmse_non"], agg["rmse_all"])
            if vis_batch is not None:
                self._log_images("valid", epoch, vis_batch)
        return totals / max(n, 1)

    def _has_protocol_masks(self) -> bool:
        """True when the shadow mask fed to Eval/* is the PROTOCOL mask
        (the binary ``_B`` stream, reference src/eval.py:67-70) rather
        than the matte-threshold proxy."""
        return (self._valid_masks is not None
                or "mask" in self.cfg.train_datas)

    def _protocol_mask(self, m, ofs: int, n: int):
        """Boolean shadow mask (N, H, W) for one validation batch.

        Priority: (a) the separately-loaded binary mask stream,
        binarized like the protocol's ``img_as_bool`` (uint8 >= 128 ==
        float > 0.5); (b) the mask already IS the m stream when the
        legacy datas include it (normalized [-1,1] > 0 is the same
        threshold); (c) matte > 0 as a proxy (tagged EvalProxy).
        """
        if self._valid_masks is not None:
            u8 = self._valid_masks[ofs:ofs + n]
            if u8.ndim == 4:
                u8 = u8[..., 0]
            if self.cfg.valid_resize is not None:
                from shadow_removal_istd_tpu.ops.resize import resize
                f = resize(jnp.asarray(u8, jnp.float32)[..., None] / 255.0,
                           self.cfg.valid_resize)[..., 0]
                return f > 0.5
            return jnp.asarray(u8 >= 128)
        return m[..., 0] > 0.0

    def _lab_parts(self, y_pred, y, mask):
        """ISTD eval-protocol sums for one validation batch, on device.

        Training tensors are BGR in [-1, 1] (reference dataflow); the
        protocol (src/eval.py) works on RGB [0, 1] LAB. ``y_pred``
        comes from eval_step's already-computed predictions; ``mask``
        from :meth:`_protocol_mask`.

        The offline protocol scores 8-bit PNGs (reference
        src/eval.py:63-70), so both sides are snapped to their PNG
        uint8 grids on device before the LAB conversion: the
        prediction through the writer's floor quantization
        (``float2uint``, reference src/utils.py:65-67 — ``astype``
        truncates), the target by rounding (its PNG source IS the
        uint8 grid; rounding undoes the float32 [-1,1] round-trip
        noise). This makes ``Eval/*`` bit-aligned with
        ``metrics/eval_cli.py`` run on the written PNGs
        (tests/test_engine.py::TestEvalBitAlignment) — in the default
        native-resolution configuration. The legacy-tree modes remain
        approximate: with ``infer_resize`` the writer resizes before
        quantizing, and with ``valid_resize`` the target tensor is
        interpolated off its source uint8 grid, so those Eval/*
        scalars track but do not equal the offline CLI.
        """
        if self._lab_parts_fn is None:
            from shadow_removal_istd_tpu.metrics.metrics import (
                region_metrics,
            )
            from shadow_removal_istd_tpu.ops.color import (
                bgr_to_rgb,
                rgb_to_lab,
            )

            def parts(y_pred, y, mask):
                # the prediction goes through the LITERAL writer ops
                # (same dtype, same floor) so the grid matches the
                # PNG the infer path would emit bit-for-bit
                q_pred = float_to_uint8(
                    denormalize(y_pred)).astype(jnp.float32) / 255.0
                q_tgt = jnp.round(jnp.clip(
                    denormalize(y.astype(jnp.float32)), 0.0, 1.0)
                    * 255.0) / 255.0
                to_lab = lambda t: rgb_to_lab(bgr_to_rgb(t))  # noqa: E731
                return region_metrics(to_lab(q_pred), to_lab(q_tgt), mask)

            self._lab_parts_fn = jax.jit(parts)
        return self._lab_parts_fn(y_pred, y, mask)

    # ------------------------------------------------------- reporting
    def _log_scalars(self, which, epoch, sums, outs, n):
        w = self._writer(which)
        loss_total = 0.8 * sums["G"] + 0.2 * sums["D"]
        for k in _METRIC_KEYS:
            w.add_scalar(f"Loss/{k}", sums[k] / n, epoch)
        w.add_scalar("Loss/total", loss_total / n, epoch)
        for d in ("D1", "D2"):
            real = outs[f"{d}_real"] / n
            fake = outs[f"{d}_fake"] / n
            w.add_scalar(f"{d}_output/real", real, epoch)
            w.add_scalar(f"{d}_output/fake", fake, epoch)
            w.add_scalar(f"{d}_output/diff", real - fake, epoch)
        w.flush()

    def _log_images(self, which, epoch, batch, n_images: int = 8):
        x, m, y = batch
        m_pred, y_pred = self.infer_step(self.state.g_params,
                                         self.state.batch_stats, x)
        w = self._writer(which)
        # grids: inputs / mattes / outputs; BGR->RGB swap for display
        # (reference src/cgan.py:373-396). Under multi-host the batch
        # is globally sharded; each process tiles its locally
        # addressable rows (no collective — TB writes are process-0
        # only anyway).
        for tag, img, bgr in (("input", x, True), ("matte", m_pred, False),
                              ("output", y_pred, True)):
            img = _host_local_rows(img, n_images)
            if bgr:
                img = img[..., ::-1]
            img = np.clip(img * 0.5 + 0.5, 0, 1)
            grid = _make_grid(img, nrow=4)
            w.add_image(tag, grid, epoch, dataformats="HWC")
        w.flush()

    # ------------------------------------------------------- inference
    def infer(self):
        """Run G1+G2 over the validation split and write PNGs
        (reference src/cgan.py:420-464).

        PNG encoding runs write-behind on a small thread pool (cv2
        releases the GIL in imencode), overlapping host IO with the
        next batch's device compute instead of serializing them like
        the reference's per-image cv.imwrite loop. The blocking
        device->host readback is likewise deferred by one batch, so
        batch i+1's compute (both pipeline stages) is dispatched
        before the host blocks on batch i's outputs.
        """
        from concurrent.futures import ThreadPoolExecutor

        from shadow_removal_istd_tpu.parallel.pipeline import overlap

        assert self.valid_pipe is not None, "no validation data"
        if jax.process_count() > 1:
            # PNG output needs full batches on one host; a pod-slice
            # run should train multi-host, then infer single-process
            # from the saved weights (they are tiny next to the data)
            raise NotImplementedError(
                "--tasks infer is single-process; rerun inference on "
                "one host with --load-weights-g1/-g2 or "
                "--load-checkpoint")
        run_infer = lambda x: self.infer_step(  # noqa: E731
            self.state.g_params, self.state.batch_stats, x)
        if self.run.pipeline_infer:
            # respect --devices: the pipeline splits the trainer's
            # selected devices (the mesh), not every chip on the host;
            # only a mesh-less trainer (no selection configured) may
            # claim the whole host
            from shadow_removal_istd_tpu.parallel.mesh import (
                MODEL_AXIS,
                SPATIAL_AXIS,
            )

            devs = (list(self.mesh.devices.flat) if self.mesh is not None
                    else jax.devices())
            if (self.mesh is not None
                    and self.mesh.shape.get(SPATIAL_AXIS, 1) > 1):
                logger.warning(
                    "--pipeline-infer ignores --spatial-shard: each "
                    "batch is re-placed onto the pipeline's own "
                    "per-stage data meshes")
            if (self.mesh is not None
                    and self.mesh.shape.get(MODEL_AXIS, 1) > 1):
                logger.warning(
                    "--pipeline-infer discards --model-shard: each "
                    "stage's FULL weights are replicated onto its "
                    "device group — if the model was sharded because "
                    "it exceeds one chip's memory, this will OOM; use "
                    "the fused (non-pipeline) infer path instead")
            if len(devs) >= 2:
                from shadow_removal_istd_tpu.parallel.pipeline import (
                    StackedPipeline,
                )
                run_infer = StackedPipeline(self.models,
                                            self.state.g_params,
                                            self.state.batch_stats,
                                            devices=devs)
            else:
                logger.warning("--pipeline-infer needs >= 2 selected "
                               "devices; using the fused path")
        for sub in ("shadowless", "matte"):
            os.makedirs(os.path.join(self.run.infered_dir, sub),
                        exist_ok=True)
        idx = 0
        futures = []
        with ThreadPoolExecutor(max_workers=4) as pool:

            def write_batch(m_dev, y_dev):
                nonlocal idx
                m_np = np.asarray(jax.device_get(m_dev))
                y_np = np.asarray(jax.device_get(y_dev))
                for i in range(m_np.shape[0]):
                    name = (self.valid_names[idx]
                            if idx < len(self.valid_names)
                            else f"{idx:05d}")
                    for sub, arr in (("shadowless", y_np[i]),
                                     ("matte", m_np[i][..., 0])):
                        path = os.path.join(self.run.infered_dir, sub,
                                            f"{name}.png")
                        os.makedirs(os.path.dirname(path), exist_ok=True)
                        futures.append(pool.submit(imwrite, path, arr))
                    idx += 1

            def compute(raw):
                batch = self._normalize(self._place(raw))
                m_pred, y_pred = run_infer(batch[0])
                m_pred = denormalize(m_pred)
                y_pred = denormalize(y_pred)
                if self.cfg.infer_resize is not None:
                    # legacy tree resizes outputs to 256x192 before
                    # writing (reference STCGAN/stcgan.py:366-373)
                    from shadow_removal_istd_tpu.ops.resize import (
                        resize_linear,
                    )
                    m_pred = resize_linear(m_pred, self.cfg.infer_resize)
                    y_pred = resize_linear(y_pred, self.cfg.infer_resize)
                return float_to_uint8(m_pred), float_to_uint8(y_pred)

            # overlap() defers the blocking readback by one batch: the
            # next batch's compute is already dispatched when the host
            # blocks on this one, so pipeline stages (and fused compute
            # vs. readback) genuinely overlap
            for m_dev, y_dev in overlap(compute, self.valid_pipe.epoch()):
                write_batch(m_dev, y_dev)
                # backpressure: bound pending writes so the queue never
                # pins more than ~2 batches of decoded outputs in host
                # memory (each pending arr keeps its batch array alive);
                # 2 futures/image (matte + shadowless) x batch x 2
                while len(futures) > 4 * max(self.cfg.batch_size, 1):
                    futures.pop(0).result()
            for f in futures:
                f.result()  # surface any write error
        return idx

    # ------------------------------------------------------ checkpoint
    def save(self, epoch: int):
        if not self._primary:
            return
        host = {"best_loss": self.best_loss}
        if self.plateau_g is not None:
            host["plateau_g"] = self.plateau_g.state_dict()
            host["plateau_d"] = self.plateau_d.state_dict()
        if self.run.checkpoint_backend == "orbax":
            if self._orbax is None:
                self._orbax = ckpt.make_orbax_checkpointer()
            # async commit: returns once the state is snapshotted; IO
            # overlaps the next epochs. In-flight commits are drained
            # at the end of train() (and before any restore).
            ckpt.save_checkpoint_orbax(self.state,
                                       self.run.checkpoint_path, epoch,
                                       host=host,
                                       checkpointer=self._orbax)
            return
        ckpt.save_checkpoint(self.state, self.run.checkpoint_path, epoch,
                             host=host)

    def _drain_async_saves(self) -> None:
        if self._orbax is not None:
            self._orbax.wait_until_finished()

    def load(self, path: str | None = None):
        self._drain_async_saves()
        path = path or self.run.checkpoint_path
        if os.path.isdir(path):
            # orbax backend directory (or one step_N dir inside it)
            self.state, epoch, host = ckpt.load_checkpoint_orbax(
                self.state, path)
        else:
            self.state, epoch, host = ckpt.load_checkpoint(
                self.state, path)
        if self.mesh is not None:
            self.state = shard_state(self.mesh, self.state)
        self.start_epoch = epoch
        if "best_loss" in host:
            self.best_loss = float(host["best_loss"])
        if self.plateau_g is not None and "plateau_g" in host:
            self.plateau_g.load_state_dict(host["plateau_g"])
            self.plateau_d.load_state_dict(host["plateau_d"])
        logger.info("checkpoint loaded (epoch %d)", epoch)

    def load_weights(self, g1=None, g2=None, d1=None, d2=None):
        """Per-network weight loading (reference src/cgan.py:525-542)."""
        for net, path in (("G1", g1), ("G2", g2), ("D1", d1), ("D2", d2)):
            if path:
                self.state = ckpt.load_model_weights(self.state, net, path)
                logger.info("loaded %s weights: %s", net, path)


class _NullWriter:
    """TensorBoard writer stand-in for non-primary processes in a
    multi-host run: the computation is identical on every process, so
    only process 0 writes event files (N processes appending to the
    same logdir produce garbled runs)."""

    def add_scalar(self, *a, **k):
        pass

    def add_image(self, *a, **k):
        pass

    def flush(self):
        pass


def _host_local_rows(arr, n: int) -> np.ndarray:
    """First ``n`` locally-available batch rows of a (possibly
    globally-sharded) array, as numpy — collective-free.

    Fully-addressable arrays (the single-process case) behave exactly
    like ``device_get(arr[:n])``. For a multi-host-sharded array the
    rows come from this process's addressable shards (deduplicated:
    replicated specs put the same global rows on several local
    devices)."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(jax.device_get(arr[:n]))
    seen, parts = set(), []
    for s in sorted(arr.addressable_shards,
                    key=lambda s: (s.index[0].start or 0)):
        key = tuple((sl.start, sl.stop) for sl in s.index)
        if key in seen:
            continue
        seen.add(key)
        parts.append(np.asarray(s.data))
    return np.concatenate(parts)[:n]


def _make_grid(images: np.ndarray, nrow: int = 4) -> np.ndarray:
    """Tile (N, H, W, C) into a (rows*H, nrow*W, 3) grid."""
    n, h, w, c = images.shape
    if c == 1:
        images = np.repeat(images, 3, axis=-1)
    rows = -(-n // nrow)
    grid = np.zeros((rows * h, nrow * w, 3), images.dtype)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = images[i]
    return grid
