"""Shadow-parameter (sp) preprocessing.

sp = shadowless / shadowed per pixel, with zero shadowed pixels clamped
to 1 before the divide (reference src/utils.py:45-47); ``apply_sp``
clip-multiplies to restore (src/utils.py:50-57). The CLI driver maps
over ``<subset>_A`` vs ``<subset>_C_fixed_official`` and saves ``.npy``
files plus optional restored images (reference src/preprocess.py:27-56).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from shadow_removal_istd_tpu.utils.image_io import imread_color, imwrite


def compute_sp(shadowed: np.ndarray, shadowless: np.ndarray) -> np.ndarray:
    """Per-pixel shadow parameters (float32)."""
    shadowed = shadowed.copy()
    shadowed[shadowed == 0] = 1
    return shadowless.astype(np.float32) / shadowed.astype(np.float32)


def apply_sp(shadowed: np.ndarray, sp: np.ndarray) -> np.ndarray:
    """Restore a shadow-free estimate: clip(sp * shadowed)."""
    if shadowed.dtype == np.uint8:
        return np.clip(sp * shadowed, 0, 255).astype(np.uint8)
    return np.clip(sp * shadowed, 0, 1).astype(np.float32)


def process_split(root: str, subset: str, save_sp: bool = True,
                  save_img: bool = False,
                  target_dirname: str | None = None) -> int:
    """Compute sp for every aligned pair in a split; returns file count."""
    image_dir = os.path.join(root, subset, f"{subset}_A")
    if target_dirname is None:
        target_dirname = f"{subset}_C_fixed_official"
        if not os.path.isdir(os.path.join(root, subset, target_dirname)):
            target_dirname = f"{subset}_C_fixed"
    target_dir = os.path.join(root, subset, target_dirname)
    sp_dir = os.path.join(root, subset, "sp")
    restored_dir = os.path.join(root, subset, "sp_restored_img")
    if save_sp:
        os.makedirs(sp_dir, exist_ok=True)
    if save_img:
        os.makedirs(restored_dir, exist_ok=True)

    filenames = sorted(os.listdir(image_dir))
    for fname in filenames:
        img = imread_color(os.path.join(image_dir, fname))
        target = imread_color(os.path.join(target_dir, fname))
        sp = compute_sp(img, target)
        stem = os.path.splitext(fname)[0]
        if save_sp:
            np.save(os.path.join(sp_dir, stem), sp)
        if save_img:
            imwrite(os.path.join(restored_dir, fname), apply_sp(img, sp))
    return len(filenames)


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Preprocess shadow removal dataset")
    parser.add_argument("--path", default="../ISTD_DATASET")
    parser.add_argument("--subset", default="train",
                        choices=["train", "test"])
    # the reference uses type=bool here (src/preprocess.py), where any
    # non-empty string — including "false"/"no" — parses as True and
    # the flags cannot be switched off; fixed with a real bool parser
    # (PARITY.md quirk ledger)
    from shadow_removal_istd_tpu.cli.main import str2bool
    parser.add_argument("--save-sp", type=str2bool, nargs="?",
                        const=True, default=True)
    parser.add_argument("--save-img", type=str2bool, nargs="?",
                        const=True, default=False)
    args = parser.parse_args(argv)
    n = process_split(args.path, args.subset, args.save_sp, args.save_img)
    print(f"completed preprocessing of {n} files", file=sys.stderr)


if __name__ == "__main__":
    main()
