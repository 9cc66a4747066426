"""Legacy-tree CLI: the reference's older fixed STCGAN pipeline.

Mirrors ``python -m STCGAN.main`` (reference STCGAN/main.py:105-251) and
its engine's fixed behaviour (STCGAN/stcgan.py):

- fixed pix2pix U-Net generators + NLayer (70x70 PatchGAN)
  discriminators regardless of --net-G/--net-D (the old engine ignores
  them, stcgan.py:34-40; the flags are accepted for CLI parity);
- hard-coded loss weights: data1=1, data2=5, adversarial=0.1/0.1, no
  visual loss (stcgan.py:117-119);
- ReduceLROnPlateau schedulers (factor .8, cooldown 10, min_lr 1e-7)
  stepped on the summed epoch losses (stcgan.py:66-71, 315-317);
- train pipeline resize->(300,400) then augment + crop --image-size,
  validation resize 256x256, inference outputs resized to 256x192
  (stcgan.py:77-86, 366-373);
- binary masks (``<subset>_B``) as the G1 target instead of mattes;
- DCGAN weight init applied at startup (stcgan.py:408-433). The
  reference's init draws BatchNorm scales from N(0,.02) — a bug we do
  not reproduce by default (use --init-compat for bit-parity).

Known deliberate deviation: the reference's rel_avg branch computes
G2's adversarial loss from D1's outputs (copy-paste bug,
stcgan.py:286-290); this engine uses the correct D2 outputs. Listed in
PARITY.md's quirk ledger.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

logger = logging.getLogger(__name__)


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("yes", "true", "t", "y", "1")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Training STCGAN (legacy tree) for shadow removal")
    parser.add_argument("--tasks", required=True, nargs="+",
                        choices=["train", "infer"], type=str)
    parser.add_argument("--devices", default=["tpu"], nargs="+", type=str)
    parser.add_argument("--batch-size", default=16, type=int)
    parser.add_argument("--epochs", default=100000, type=int)
    parser.add_argument("--lr-D", default=0.00002, type=float)
    parser.add_argument("--lr-G", default=0.00005, type=float)
    parser.add_argument("--decay", default=0.00005, type=float)
    parser.add_argument("--workers", default=4, type=int)
    parser.add_argument("--weights", default="../weights", type=str)
    parser.add_argument("--infered", default="../infered", type=str)
    parser.add_argument("--logs", default="../logs", type=str)
    parser.add_argument("--data-dir", default="../ISTD_DATASET", type=str)
    parser.add_argument("--image-size", default=256, type=int)
    parser.add_argument("--aug-scale", default=0.05, type=float)
    parser.add_argument("--aug-angle", default=15, type=int)
    parser.add_argument("--net-G", default="mnet",
                        choices=["unet", "mnet", "denseunet"], type=str)
    parser.add_argument("--net-D", default="patchgan",
                        choices=["patchgan"], type=str)
    parser.add_argument("--load-weights-g1", default=None)
    parser.add_argument("--load-weights-g2", default=None)
    parser.add_argument("--load-weights-d1", default=None)
    parser.add_argument("--load-weights-d2", default=None)
    parser.add_argument("--D-loss-fn", default="standard",
                        choices=["standard", "leastsquare"], type=str)
    parser.add_argument("--D-loss-type", default="normal",
                        choices=["normal", "rel", "rel_avg"], type=str)
    parser.add_argument("--softadapt", type=str2bool, default=False,
                        const=True, nargs="?")
    parser.add_argument("--manual_seed", default=38107943, type=int)
    parser.add_argument("--SELU", default=False, type=str2bool)
    parser.add_argument("--beta1", default=0.5, type=float)
    parser.add_argument("--beta2", default=0.999, type=float)
    parser.add_argument("--NN-upconv", type=str2bool, default=False,
                        const=True, nargs="?")
    # Parsed for CLI parity but NOT implemented — exactly like the
    # reference, which parses these and never reads them
    # (STCGAN/main.py:236-239). Unlike the reference, passing a truthy
    # value here REFUSES to run (see main) instead of silently
    # training with BatchNorm anyway: a flag that sounds
    # behavior-changing must not be a silent no-op.
    parser.add_argument("--no-batch-norm-G", type=str2bool, default=False,
                        const=True, nargs="?")
    parser.add_argument("--no-batch-norm-D", type=str2bool, default=False,
                        const=True, nargs="?")
    parser.add_argument("--log-every", default=3, type=int)
    parser.add_argument("--valid-every", default=10, type=int)
    # extensions
    parser.add_argument("--init-compat", type=str2bool, default=False,
                        const=True, nargs="?",
                        help="reproduce the reference's BN-scale N(0,.02) "
                             "init bug exactly")
    return parser


def main(args) -> None:
    if args.no_batch_norm_G or args.no_batch_norm_D:
        raise SystemExit(
            "--no-batch-norm-G/-D are parsed for CLI parity but not "
            "implemented (the reference also parses and ignores them, "
            "STCGAN/main.py:236-239); refusing to train with BatchNorm "
            "silently enabled — drop the flag")
    from shadow_removal_istd_tpu.cli.main import (
        _enable_compilation_cache,
        _sync_platform_env,
    )
    _sync_platform_env()
    _enable_compilation_cache()
    time_str = time.strftime("%Y%m%d-%H%M%S")
    os.makedirs(args.logs, exist_ok=True)
    if "train" in args.tasks:
        os.makedirs(args.weights, exist_ok=True)
    if "infer" in args.tasks:
        os.makedirs(args.infered, exist_ok=True)
    with open(os.path.join(args.logs, "args.json"), "w") as fp:
        json.dump(vars(args), fp, indent=4, sort_keys=True)
    logging.basicConfig(
        level=logging.INFO,
        filename=os.path.join(args.logs, f"stcgan-{time_str}.log"))
    logging.getLogger().addHandler(logging.StreamHandler())
    logger.info("Arguments: %s", args)

    from shadow_removal_istd_tpu.cli.main import _select_mesh
    from shadow_removal_istd_tpu.engine import (
        RunConfig,
        TrainConfig,
        Trainer,
    )

    cfg = TrainConfig(
        # the old engine hard-wires pix2pix G + NLayer D (stcgan.py:34-40)
        net_g="stcgan", net_d="stcgan", ngf=64, ndf=64,
        droprate=0.0, nn_upconv=args.NN_upconv, use_selu=args.SELU,
        activation="tanh",
        lr_g=args.lr_G, lr_d=args.lr_D, decay=args.decay,
        beta1=args.beta1, beta2=args.beta2,
        # fixed weights (stcgan.py:117-119); no visual loss
        lambda1=5.0, lambda2=0.1, lambda3=0.1, lambda4=0.0, lambda5=0.0,
        d_loss_fn=args.D_loss_fn, d_type=args.D_loss_type,
        loss_mode="reference", softadapt=args.softadapt,
        image_size=args.image_size, batch_size=args.batch_size,
        aug_scale=args.aug_scale, aug_angle=args.aug_angle,
        lr_schedule="plateau",
        aug_resize=(300, 400),
        valid_resize=(256, 256),
        infer_resize=(192, 256),   # cv.resize(y, (256, 192)) = 192 rows
        dcgan_init=True,
        dcgan_bn_compat=args.init_compat,
        train_datas=("img", "mask", "target"),
        use_visual_loss=False,
    )
    run = RunConfig(
        data_dirs=(args.data_dir,),
        logs_dir=args.logs, weights_dir=args.weights,
        infered_dir=args.infered,
        checkpoint_path=os.path.join(args.weights, "checkpoint.msgpack"),
        log_every=args.log_every, valid_every=args.valid_every,
        vis_every=max(args.log_every, 1) * 10, save_every=args.log_every,
        seed=args.manual_seed,
        tasks=tuple(args.tasks),
    )

    trainer = Trainer(cfg, run,
                      mesh=_select_mesh(list(args.devices),
                                        args.batch_size))
    trainer.load_weights(g1=args.load_weights_g1, g2=args.load_weights_g2,
                         d1=args.load_weights_d1, d2=args.load_weights_d2)
    if "train" in args.tasks:
        trainer.train(args.epochs)
    if trainer.preempted:
        logger.warning("preempted: skipping remaining tasks")
        return
    if "infer" in args.tasks:
        trainer.infer()


if __name__ == "__main__":
    main(build_parser().parse_args())
