"""Export a trained checkpoint as reference-format torch ``.pt`` files.

The inverse of ``--load-weights-*``: weights trained in this framework
become ``{G1,G2,D1,D2}_{ClassName}_{suffix}.pt`` state_dict files with
the reference's exact naming and tensor layouts (reference
src/cgan.py:466-488 save format), loadable by the reference's
``init_weight``/``--load-weights-*`` path unchanged. A user can train
here on TPU and hand the weights straight back to the torch pipeline.

Requires the reference implementation importable (its model classes
define the state_dict): pass ``--reference-path`` pointing at the repo
root that contains ``src/``.

    python -m shadow_removal_istd_tpu.tools.export_torch \\
        --load-checkpoint w/checkpoint.msgpack --out-dir torch_w \\
        --reference-path /path/to/Shadow-Removal-ISTD [--suffix best] \\
        [--net-G mnet --net-D patchgan --ngf 64 --ndf 64 ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import types


def _import_reference(reference_path: str):
    sys.path.insert(0, reference_path)
    # src.loss pulls torchvision at import time; the networks module
    # itself doesn't need it
    for name in ("torchvision", "torchvision.models",
                 "torchvision.transforms"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision"].transforms = (
        sys.modules["torchvision.transforms"])
    from src import networks as rn
    return rn


def export_reference_weights(state, models, cfg, out_dir: str,
                             reference_path: str,
                             suffix: str = "latest") -> list[str]:
    """Write the four reference-format ``.pt`` files; returns paths."""
    import numpy as np
    import torch

    from shadow_removal_istd_tpu.tools.torch_bridge import (
        flax_variables_to_torch,
    )

    rn = _import_reference(reference_path)
    size = 64  # trace size only; fully-convolutional nets
    g_kw = dict(ngf=cfg.ngf, drop_rate=0.0, no_conv_t=cfg.nn_upconv,
                use_selu=cfg.use_selu, activation=cfg.activation)
    nets = {
        "G1": (rn.get_generator(cfg.net_g, in_channels=3, out_channels=1,
                                **g_kw), models.g1, (1, size, size, 3)),
        "G2": (rn.get_generator(cfg.net_g, in_channels=4, out_channels=3,
                                **g_kw), models.g2, (1, size, size, 4)),
        "D1": (rn.get_discriminator(cfg.net_d, in_channels=4,
                                    out_channels=1, ndf=cfg.ndf,
                                    use_selu=cfg.use_selu,
                                    use_sigmoid=False),
               models.d1, (1, size, size, 4)),
        "D2": (rn.get_discriminator(cfg.net_d, in_channels=7,
                                    out_channels=3, ndf=cfg.ndf,
                                    use_selu=cfg.use_selu,
                                    use_sigmoid=False),
               models.d2, (1, size, size, 7)),
    }
    groups = {"G1": ("g_params", "g1"), "G2": ("g_params", "g2"),
              "D1": ("d_params", "d1"), "D2": ("d_params", "d2")}
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for name, (tnet, fnet, shape) in nets.items():
        group, key = groups[name]
        variables = {"params": getattr(state, group)[key],
                     "batch_stats": state.batch_stats[key]}
        x = np.zeros(shape, np.float32)
        flax_variables_to_torch(variables, fnet, tnet, x)
        path = os.path.join(
            out_dir, f"{name}_{tnet.__class__.__name__}_{suffix}.pt")
        torch.save(tnet.state_dict(), path)
        written.append(path)
    return written


def main(argv=None):
    import jax

    from shadow_removal_istd_tpu.cli.main import _sync_platform_env
    _sync_platform_env()  # honor JAX_PLATFORMS under pre-imported jax
    from shadow_removal_istd_tpu.engine import (
        TrainConfig,
        build_models,
        init_state,
    )
    from shadow_removal_istd_tpu.engine.checkpoint import load_checkpoint

    parser = argparse.ArgumentParser(
        description="export a trained checkpoint as reference-format "
                    "torch .pt weight files")
    parser.add_argument("--load-checkpoint", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--reference-path", required=True,
                        help="path to the reference repo root "
                             "(contains src/)")
    parser.add_argument("--suffix", default="latest")
    parser.add_argument("--net-G", default="mnet")
    parser.add_argument("--net-D", default="patchgan")
    parser.add_argument("--ngf", type=int, default=64)
    parser.add_argument("--ndf", type=int, default=64)
    parser.add_argument("--NN-upconv", action="store_true")
    parser.add_argument("--SELU", action="store_true")
    parser.add_argument("--activation", default="tanh")
    args = parser.parse_args(argv)

    cfg = TrainConfig(net_g=args.net_G, net_d=args.net_D, ngf=args.ngf,
                      ndf=args.ndf, nn_upconv=args.NN_upconv,
                      use_selu=args.SELU, activation=args.activation,
                      use_visual_loss=False, droprate=0.0)
    models = build_models(cfg)
    state = init_state(jax.random.key(0), cfg, models, image_size=32)
    state, _, _ = load_checkpoint(state, args.load_checkpoint)
    written = export_reference_weights(state, models, cfg, args.out_dir,
                                       args.reference_path, args.suffix)
    for p in written:
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
