"""One-time torchvision VGG-19-BN -> npz weight conversion.

The visual loss (reference src/loss.py:40-41) needs torchvision's
pretrained ``vgg19_bn.features[:40]``. TPU hosts don't ship torchvision,
so this tool converts the weights once (on any machine with torchvision)
into the npz layout ``models/vgg.py:load_vgg_variables`` reads:

    python -m shadow_removal_istd_tpu.tools.convert_vgg --out vgg19_bn.npz

Conv kernels transpose torch OIHW -> flax HWIO; BatchNorm maps
weight/bias/running_mean/running_var -> scale/bias/mean/var.
"""

from __future__ import annotations

import argparse

import numpy as np


def convert_state_dict(state_dict: dict) -> dict[str, np.ndarray]:
    """torch ``vgg19_bn.features`` state_dict -> flat npz dict."""
    # features[:40] layer indices: conv/bn pairs at
    # (0,1),(3,4),(7,8),(10,11),(14,15),(17,18),(20,21),(23,24),
    # (27,28),(30,31),(33,34),(36,37)
    conv_bn_indices = [(0, 1), (3, 4), (7, 8), (10, 11),
                       (14, 15), (17, 18), (20, 21), (23, 24),
                       (27, 28), (30, 31), (33, 34), (36, 37)]
    out: dict[str, np.ndarray] = {}
    for i, (ci, bi) in enumerate(conv_bn_indices):
        w = np.asarray(state_dict[f"{ci}.weight"])      # (O, I, H, W)
        b = np.asarray(state_dict[f"{ci}.bias"])
        out[f"conv{i}_kernel"] = w.transpose(2, 3, 1, 0)  # -> (H, W, I, O)
        out[f"conv{i}_bias"] = b
        out[f"bn{i}_scale"] = np.asarray(state_dict[f"{bi}.weight"])
        out[f"bn{i}_bias"] = np.asarray(state_dict[f"{bi}.bias"])
        out[f"bn{i}_mean"] = np.asarray(state_dict[f"{bi}.running_mean"])
        out[f"bn{i}_var"] = np.asarray(state_dict[f"{bi}.running_var"])
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert torchvision vgg19_bn weights to npz")
    parser.add_argument("--out", default="vgg19_bn.npz")
    parser.add_argument("--state-dict", default=None,
                        help="path to a saved features state_dict (.pt); "
                             "downloads via torchvision when omitted")
    args = parser.parse_args(argv)

    if args.state_dict:
        import torch
        sd = torch.load(args.state_dict, map_location="cpu")
    else:
        try:
            from torchvision import models
        except ImportError as e:
            raise SystemExit(
                "torchvision unavailable; run this tool on a machine that "
                "has it, or pass --state-dict") from e
        vgg = models.vgg19_bn(pretrained=True, progress=False)
        sd = vgg.features.state_dict()

    # accept the raw torchvision checkpoint (full-model keys like
    # "features.0.weight", what scripts/fetch_vgg19_bn.sh downloads)
    # as well as a features-only state_dict ("0.weight")
    sd = {(k[len("features."):] if k.startswith("features.") else k): v
          for k, v in sd.items()}
    np.savez(args.out, **convert_state_dict(sd))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
