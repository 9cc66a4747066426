"""Training / inference CLI.

Preserves the reference's public flag surface (src/main.py:132-329): the
same flag names, defaults, choices, args.json snapshot/reload, run-dir
naming that encodes lr / D-type / D-loss (src/main.py:100-118), and
seeding. A user of ``python -m src.main`` can switch to
``python -m shadow_removal_istd_tpu.cli.main`` with the same command
line.

Differences, deliberate:
- ``--devices`` selects JAX devices (e.g. "tpu", "cpu", or a count for
  the data-parallel mesh) instead of CUDA ids; >1 device builds a mesh.
- ``--load-args`` preserved-key list includes the comma the reference
  is missing (src/main.py:29-30 fuses "load_args" "load_checkpoint"
  into one string).
- checkpoints save on multiples of --save-every (the reference's
  ``if epoch % save_interval:`` saves on NON-multiples,
  src/cgan.py:230-231).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import random
import re
import time

import numpy as np

logger = logging.getLogger(__name__)

PRESERVED_ARGS = [
    "load_args",
    "load_checkpoint",
    "load_weights_g1",
    "load_weights_g2",
    "load_weights_d1",
    "load_weights_d2",
    "weights", "logs",
    # per-invocation infrastructure, never part of a run's identity
    "coordinator", "num_processes", "process_id",
]


def str2bool(v: str) -> bool:
    return v.lower() in ("yes", "true", "t", "y", "1")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Training ST-CGAN model for shadow removal (TPU)")
    parser.add_argument("--tasks", required=True, nargs="+",
                        choices=["train", "infer", "serve"], type=str,
                        help="the task to run; 'serve' (beyond the "
                             "reference) starts the online HTTP daemon "
                             "on the loaded/trained weights "
                             "(default: %(default)s)")
    parser.add_argument("--devices", default=["tpu"],
                        type=lambda s: re.split(", *| +", s),
                        help="jax devices/platform (default: %(default)s)")
    parser.add_argument("--batch-size", default=16, type=int)
    parser.add_argument("--epochs", default=100000, type=int)
    parser.add_argument("--data-dir", default=[],
                        type=lambda s: re.split(", *| +", s),
                        help="root folder(s) with images")
    parser.add_argument("--data-h5", default=None,
                        help="HDF5 dataset file (build with "
                             "shadow_removal_istd_tpu.data.h5.build_h5); "
                             "takes precedence over --data-dir")
    parser.add_argument("--workers", default=4, type=int,
                        help="kept for CLI parity; the host pipeline is "
                             "prefetch-based, not worker-based")
    parser.add_argument("--image-size", default=256, type=int)
    parser.add_argument("--aug-scale", default=0.05, type=float)
    parser.add_argument("--aug-angle", default=15, type=int)
    parser.add_argument("--net-G", default="mnet",
                        choices=["unet", "mnet", "denseunet", "stcgan"])
    parser.add_argument("--net-D", default="patchgan",
                        choices=["patchgan", "began", "stcgan", "dummy"])
    parser.add_argument("--ngf", default=64, type=int)
    parser.add_argument("--ndf", default=64, type=int)
    parser.add_argument("--droprate", default=0.05, type=float)
    parser.add_argument("--lr-D", default=0.0001, type=float)
    parser.add_argument("--lr-G", default=0.0005, type=float)
    parser.add_argument("--decay", default=0.003, type=float)
    parser.add_argument("--beta1", default=0.5, type=float)
    parser.add_argument("--beta2", default=0.999, type=float)
    parser.add_argument("--lambda1", default=5, type=float)
    parser.add_argument("--lambda2", default=0.5, type=float)
    parser.add_argument("--lambda3", default=0.5, type=float)
    parser.add_argument("--lambda4", default=5, type=float)
    parser.add_argument("--lambda5", default=50, type=float)
    parser.add_argument("--manual_seed", default=38107943, type=int)
    parser.add_argument("--load-weights-g1", default=None)
    parser.add_argument("--load-weights-g2", default=None)
    parser.add_argument("--load-weights-d1", default=None)
    parser.add_argument("--load-weights-d2", default=None)
    parser.add_argument("--load-args", default=None)
    parser.add_argument("--load-checkpoint", default=None)
    parser.add_argument("--D-loss-fn", default="standard",
                        choices=["standard", "leastsquare"])
    parser.add_argument("--D-type", default="normal",
                        choices=["normal", "rel", "rel_avg"])
    parser.add_argument("--softadapt", type=str2bool, default=False,
                        const=True, nargs="?")
    parser.add_argument("--SELU", type=str2bool, default=False,
                        const=True, nargs="?")
    parser.add_argument("--NN-upconv", type=str2bool, default=False,
                        const=True, nargs="?")
    parser.add_argument("--activation", default="tanh",
                        choices=["none", "sigmoid", "tanh", "htanh"])
    parser.add_argument("--log-every", default=3, type=int)
    parser.add_argument("--valid-every", default=10, type=int)
    parser.add_argument("--vis-every", default=50, type=int)
    parser.add_argument("--save-every", default=50, type=int)
    parser.add_argument("--weights", default="./weights")
    parser.add_argument("--infered", default="./infered")
    parser.add_argument("--logs", default="./logs")
    # TPU-native extensions (not in the reference)
    parser.add_argument("--vgg-weights", default=None,
                        help="converted VGG19-BN .npz for the visual loss")
    parser.add_argument("--allow-missing-vgg", action="store_true",
                        help="train WITHOUT the perceptual terms (warning "
                             "instead of an error) when lambda4/lambda5 "
                             "are nonzero but no --vgg-weights is given")
    parser.add_argument("--loss-mode", default="reference",
                        choices=["reference", "corrected"],
                        help="reference-exact vs corrected adversarial "
                             "loss flag semantics")
    parser.add_argument("--compute-dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = mixed-precision training "
                             "(f32 params/BN/losses)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize the train step "
                             "(jax.checkpoint): ~+1 forward per phase "
                             "for far lower activation HBM — enables "
                             "larger/full-resolution training batches")
    parser.add_argument("--device-cache", type=str2bool, default=True,
                        const=True, nargs="?",
                        help="keep the dataset in HBM and run whole "
                             "epochs as one device dispatch")
    parser.add_argument("--aug-method", default="shear",
                        choices=["gather", "shear"],
                        help="augmentation kernel: exact bilinear gather "
                             "or the ~7x faster Pallas 3-shear path")
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of one "
                             "training epoch into this directory")
    parser.add_argument("--spatial-shard", type=int, default=1,
                        help="shard image H rows over this many devices "
                             "(spatial partitioning with GSPMD halo "
                             "exchange; scales full-resolution inference "
                             "latency, combines with data parallelism)")
    parser.add_argument("--model-shard", type=int, default=1,
                        help="tensor parallelism: shard conv feature "
                             "channels (weights, BN stats, Adam moments) "
                             "over this many devices — scales model + "
                             "optimizer memory past one chip's HBM; "
                             "combines with data parallelism, exclusive "
                             "with --spatial-shard")
    parser.add_argument("--checkpoint-backend", default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="full-state checkpoint format: msgpack = "
                             "one file, synchronous write; orbax = "
                             "directory of step_N checkpoints with "
                             "ASYNC commit (the epoch loop keeps "
                             "training while orbax serializes) — use "
                             "for large states; --load-checkpoint "
                             "accepts either (file vs directory)")
    parser.add_argument("--coordinator", default=None,
                        help="multi-host training: coordinator "
                             "address host:port (process 0's); starts "
                             "jax.distributed so --devices sees the "
                             "GLOBAL device set across all processes — "
                             "the pod-slice analogue of the reference's "
                             "--devices multi-GPU flag "
                             "(src/cgan.py:78-84)")
    parser.add_argument("--num-processes", type=int, default=None,
                        help="multi-host training: total process count "
                             "(one per host)")
    parser.add_argument("--process-id", type=int, default=None,
                        help="multi-host training: this process's rank "
                             "(0..num-processes-1)")
    parser.add_argument("--serve-host", default="127.0.0.1",
                        help="--tasks serve: bind address")
    parser.add_argument("--serve-port", default=8650, type=int,
                        help="--tasks serve: port (0 = ephemeral)")
    parser.add_argument("--serve-window-ms", default=5.0, type=float,
                        help="--tasks serve: micro-batching window")
    parser.add_argument("--serve-max-batch", default=8, type=int,
                        help="--tasks serve: max coalesced batch")
    parser.add_argument("--serve-max-queue", default=None, type=int,
                        help="--tasks serve: admission-control queue "
                             "bound — beyond it requests get 503 + "
                             "Retry-After (default 8*max-batch)")
    parser.add_argument("--serve-timeout-s", default=600.0, type=float,
                        help="--tasks serve: per-request deadline; "
                             "requests expired while queued are "
                             "dropped before dispatch")
    parser.add_argument("--pipeline-infer", action="store_true",
                        help="pipeline parallelism for inference: G1 on "
                             "one device group, G2 on the other, matte "
                             "handed over between stages (halves "
                             "per-device weight memory; throughput set "
                             "by the slower stage)")
    parser.add_argument("--eval-metrics", action="store_true",
                        help="during validation, also compute the ISTD "
                             "LAB RMSE/MAE eval protocol (src/eval.py "
                             "formulas) on device against the ground "
                             "truth and log Eval/* scalars")
    parser.add_argument("--preempt-save", type=str2bool, default=True,
                        help="on SIGTERM (preemptible VM eviction "
                             "notice), write the full checkpoint at the "
                             "next epoch boundary and exit cleanly")
    parser.add_argument("--export-stablehlo", default=None,
                        help="after the tasks finish, serialize the "
                             "stacked G1+G2 inference graph (params "
                             "baked in, symbolic batch, tpu+cpu "
                             "lowerings) to this path — a self-contained "
                             "serving artifact loadable with jax alone")
    parser.add_argument("--export-shape", type=int, nargs=2,
                        default=[480, 640], metavar=("H", "W"),
                        help="image H W for --export-stablehlo "
                             "(ISTD native 480 640)")
    return parser



def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first compiles through the TPU
    tunnel cost minutes; subsequent CLI invocations reuse them. Override
    the location with SRIT_COMPILE_CACHE (empty string disables)."""
    import jax

    cache_dir = os.environ.get(
        "SRIT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "srit_jax_cache"))
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def makedirs(args) -> None:
    """Run-dir naming encoding hyperparameters (src/main.py:100-118)."""
    arg_str = f"_lr{args.lr_G:.5f}_"
    if args.D_type == "normal":
        arg_str += ""
    elif args.D_type == "rel":
        arg_str += "Rp"
    else:
        arg_str += "Ra"
    if args.D_loss_fn == "standard":
        arg_str += "SGAN"
    else:
        arg_str += "LSGAN"
    args.weights += arg_str
    args.logs += arg_str
    os.makedirs(args.logs, exist_ok=True)
    if "train" in args.tasks:
        os.makedirs(args.weights, exist_ok=True)
    if "infer" in args.tasks:
        os.makedirs(args.infered, exist_ok=True)


def snapshotargs(args, filename: str = "args.json") -> None:
    args_file = os.path.join(args.logs, filename)
    with open(args_file, "w") as fp:
        json.dump(vars(args), fp, indent=4, sort_keys=True)


def load_args(args) -> None:
    """--load-args: restore a previous run's flags, preserving the
    load/output paths of the current invocation."""
    with open(args.load_args, "r") as f:
        arg_dict = json.load(f)
    for k in PRESERVED_ARGS:
        arg_dict.pop(k, None)
    args.__dict__.update(arg_dict)


def set_manual_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def set_logger(log_file: str) -> None:
    from shadow_removal_istd_tpu.utils.logging_utils import setup_logging
    setup_logging(log_file)


def prepare_run_dirs(args) -> None:
    """Reference order (src/main.py:24-40): makedirs and the args.json
    snapshot come FIRST, from the current invocation's flags; only then
    does --load-args overlay the stored run's flags — so run-dir naming
    and the snapshot reflect what the user typed, and tooling that
    locates run dirs by the reference's convention keeps working."""
    makedirs(args)
    snapshotargs(args)
    if args.load_args is not None:
        load_args(args)


def _sync_platform_env() -> None:
    """Make the CLI honor ``JAX_PLATFORMS`` even when jax was imported
    before the variable could take effect.

    Some environments (e.g. hosts whose sitecustomize pre-imports jax
    to register a TPU plugin) freeze ``jax_platforms`` at interpreter
    startup; a later ``JAX_PLATFORMS=cpu python -m ...cli.main`` then
    silently initializes the original backend. Syncing the config from
    the env var before the first backend use restores the documented
    env-var contract. No-op once a backend exists (too late to switch).
    """
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        import jax._src.xla_bridge as xb
        if getattr(xb, "_backends", None):
            return  # a backend is live; switching now would fail
    except Exception:
        pass
    if jax.config.jax_platforms != want:
        jax.config.update("jax_platforms", want)


def _select_mesh(devices: list[str], batch_size: int,
                 spatial_shard: int = 1, model_shard: int = 1):
    """Map --devices onto a JAX mesh (None = single default device).

    Accepts a device count ("8") or a platform name ("tpu"/"cpu"); the
    data-axis size is capped to the largest divisor of the global batch
    size so every device gets an equal shard. ``spatial_shard > 1``
    builds a 2-D (data x spatial) mesh whose spatial axis shards image
    H rows (GSPMD conv halo exchange over ICI); ``model_shard > 1`` a
    2-D (data x model) mesh whose model axis shards conv feature
    channels (tensor parallelism). Both together build a 3-D
    (data x spatial x model) mesh — forward work shards batch + H rows
    while weights stay channel-sharded (see make_mesh_3d).
    """
    import jax
    from shadow_removal_istd_tpu.parallel.mesh import (
        make_mesh,
        make_mesh_2d,
        make_mesh_3d,
        make_mesh_tp,
    )

    avail = jax.devices()
    if devices and devices[0].isdigit():
        want = int(devices[0])
    elif devices and not devices[0].isdigit():
        try:  # platform name: restrict to that backend's devices
            avail = jax.devices(devices[0])
        except RuntimeError:
            logger.warning("no %r devices; using default backend",
                           devices[0])
        want = len(avail)
    else:
        want = len(avail)
    want = min(want, len(avail))
    sp = max(1, spatial_shard)
    if sp > want:
        logger.warning("--spatial-shard %d > %d available devices; "
                       "capping", sp, want)
        sp = want
    mp = max(1, model_shard)
    if mp > want:
        logger.warning("--model-shard %d > %d available devices; "
                       "capping", mp, want)
        mp = want
    if sp * mp > want:
        new_sp = max(1, want // mp)
        logger.warning(
            "--spatial-shard %d x --model-shard %d needs %d devices "
            "but only %d are available; capping spatial to %d",
            sp, mp, sp * mp, want, new_sp)
        sp = new_sp
    n = min(want // (sp * mp), batch_size)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if sp > 1 and mp > 1:
        return make_mesh_3d(max(n, 1), sp, mp, avail)
    if mp > 1:
        return make_mesh_tp(max(n, 1), mp, avail)
    if sp > 1:
        return make_mesh_2d(max(n, 1), sp, avail)
    if n > 1:
        return make_mesh(avail[:n])
    return None


def _maybe_distributed_init(args) -> None:
    """Start jax.distributed for pod-slice runs — BEFORE the first
    backend touch, so every later ``jax.devices()`` call (mesh
    selection, the Trainer) sees the global device set.

    All three flags (--coordinator/--num-processes/--process-id) are
    required together; none given = single-process (users on managed
    pod-slice launchers that export the JAX cluster env can also rely
    on jax's own autodetection by initializing out-of-band).
    """
    from shadow_removal_istd_tpu.parallel.mesh import distributed_init

    if args.num_processes is not None:
        if args.coordinator is None or args.process_id is None:
            raise SystemExit(
                "--num-processes needs --coordinator host:port and "
                "--process-id")
        distributed_init(args.coordinator, args.num_processes,
                         args.process_id)
        # Establish the collective transport NOW, while every process
        # is still in lockstep: the first collective otherwise happens
        # after each rank's (minutes-long, skew-prone) first jit
        # compile, and transport-level connect timeouts (observed with
        # Gloo on CPU) kill the run before the real work starts. Also
        # fails fast, at a clear point, on a misconfigured cluster.
        import jax
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("srit-startup")
        logger.info("multi-host up: process %d/%d, %d global devices",
                    args.process_id, args.num_processes,
                    len(jax.devices()))
    elif args.coordinator is not None:
        raise SystemExit("--coordinator needs --num-processes and "
                         "--process-id")


def main(args) -> None:
    _sync_platform_env()
    _maybe_distributed_init(args)
    time_str = time.strftime("%Y%m%d-%H%M%S")
    _enable_compilation_cache()
    prepare_run_dirs(args)
    if args.manual_seed != -1:
        set_manual_seed(args.manual_seed)
    import jax
    rank = f"-p{jax.process_index()}" if jax.process_count() > 1 else ""
    set_logger(os.path.join(args.logs, f"main-{time_str}{rank}.log"))
    logger.info("Arguments: %s", args)

    if jax.process_count() > 1 and "serve" in args.tasks:
        raise SystemExit("--tasks serve is single-process; serve from "
                         "the saved weights on one host (data-parallel "
                         "serving uses --devices N within a host)")
    if (("infer" in args.tasks or "serve" in args.tasks)
            and "train" not in args.tasks):
        assert args.load_weights_g1 is not None or args.load_checkpoint, \
            "inference needs --load-weights-g1/g2 or --load-checkpoint"
        if args.load_checkpoint is None:
            assert args.load_weights_g2 is not None

    from shadow_removal_istd_tpu.engine import (
        RunConfig,
        TrainConfig,
        Trainer,
    )

    cfg = TrainConfig(
        net_g=args.net_G, net_d=args.net_D, ngf=args.ngf, ndf=args.ndf,
        droprate=args.droprate, nn_upconv=args.NN_upconv,
        use_selu=args.SELU, activation=args.activation,
        lr_g=args.lr_G, lr_d=args.lr_D, decay=args.decay,
        beta1=args.beta1, beta2=args.beta2,
        lambda1=args.lambda1, lambda2=args.lambda2, lambda3=args.lambda3,
        lambda4=args.lambda4, lambda5=args.lambda5,
        d_loss_fn=args.D_loss_fn, d_type=args.D_type,
        loss_mode=args.loss_mode, softadapt=args.softadapt,
        image_size=args.image_size, batch_size=args.batch_size,
        aug_scale=args.aug_scale, aug_angle=args.aug_angle,
        use_visual_loss=True,  # Trainer warns+disables if no weights
        compute_dtype=args.compute_dtype,
        aug_method=args.aug_method,
        remat=args.remat,
    )
    run = RunConfig(
        data_dirs=tuple(args.data_dir), data_h5=args.data_h5,
        logs_dir=args.logs, weights_dir=args.weights,
        infered_dir=args.infered,
        checkpoint_path=os.path.join(
            args.weights,
            "checkpoint.msgpack" if args.checkpoint_backend == "msgpack"
            else "checkpoint_orbax"),
        checkpoint_backend=args.checkpoint_backend,
        log_every=args.log_every, valid_every=args.valid_every,
        vis_every=args.vis_every, save_every=args.save_every,
        seed=args.manual_seed if args.manual_seed != -1 else 0,
        vgg_weights=args.vgg_weights,
        allow_missing_vgg=args.allow_missing_vgg, tasks=tuple(args.tasks),
        device_cache=args.device_cache,
        profile_dir=args.profile_dir,
        preempt_save=args.preempt_save,
        eval_metrics=args.eval_metrics,
        pipeline_infer=args.pipeline_infer,
    )

    if args.spatial_shard > 1 and "train" in args.tasks:
        logger.warning(
            "--spatial-shard accelerates forward-only work (validation/"
            "inference); training batches shard on the data axis only "
            "(see parallel.mesh.train_batch_sharding)")
    trainer = Trainer(cfg, run,
                      mesh=_select_mesh(args.devices, args.batch_size,
                                        args.spatial_shard,
                                        args.model_shard))
    trainer.load_weights(g1=args.load_weights_g1, g2=args.load_weights_g2,
                         d1=args.load_weights_d1, d2=args.load_weights_d2)
    if args.load_checkpoint is not None:
        # a file (msgpack) or a directory (orbax backend / step_N dir)
        if not os.path.exists(args.load_checkpoint):
            print(f"{args.load_checkpoint} does not exist")
        else:
            trainer.load(args.load_checkpoint)

    if "train" in args.tasks:
        trainer.train(args.epochs)
    if trainer.preempted:
        # eviction imminent: the checkpoint is the deliverable — don't
        # burn the grace period on inference/export (a SIGKILL mid-way
        # would leave truncated outputs)
        logger.warning("preempted: skipping remaining tasks")
        return
    if "infer" in args.tasks:
        trainer.infer()
    if "serve" in args.tasks:
        _serve(trainer, cfg, args)
    if args.export_stablehlo:
        from shadow_removal_istd_tpu.tools.export import (
            export_stacked_inference,
        )
        nbytes = export_stacked_inference(
            args.export_stablehlo, trainer.state, trainer.models,
            image_shape=tuple(args.export_shape))
        logger.info("serialized serving artifact: %s (%.1f MB)",
                    args.export_stablehlo, nbytes / 1e6)


def _serve(trainer, cfg, args) -> None:
    """``--tasks serve``: hand the (trained or loaded) generator state
    to the online daemon — no msgpack round-trip. Blocks until
    SIGTERM/SIGINT (which override the trainer's preemption handler:
    during serving the graceful action IS shutting the server down)."""
    import signal
    import threading

    from shadow_removal_istd_tpu.serving import (
        InferenceEngine,
        ShadowRemovalServer,
    )

    engine = InferenceEngine(
        cfg.net_g, ngf=cfg.ngf, droprate=cfg.droprate,
        nn_upconv=cfg.nn_upconv, use_selu=cfg.use_selu,
        activation=cfg.activation,
        dtype=("bfloat16" if cfg.compute_dtype == "bfloat16"
               else "float32"),
        max_batch=args.serve_max_batch)
    state = trainer.state
    engine.set_variables(
        {"params": state.g_params["g1"],
         "batch_stats": state.batch_stats["g1"]},
        {"params": state.g_params["g2"],
         "batch_stats": state.batch_stats["g2"]})
    server = ShadowRemovalServer(engine, host=args.serve_host,
                                 port=args.serve_port,
                                 window_ms=args.serve_window_ms,
                                 max_queue=args.serve_max_queue,
                                 request_timeout_s=args.serve_timeout_s)

    def _on_signal(signum, frame):
        logger.info("signal %d: stopping server", signum)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    logger.info("serving on http://%s:%d (POST /v1/unshadow)",
                *server.address)
    server.serve_forever()


if __name__ == "__main__":
    main(build_parser().parse_args())
