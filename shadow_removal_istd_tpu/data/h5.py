"""HDF5 ISTD dataset variant.

Mirrors the reference's STCGAN/dataset_h5.py: groups ``<subset>`` with
datasets ``input_img``, ``target_img``, ``sp`` (shadow parameters) and
``filename``; per-sample normalization with the dataset's B,G,R
statistics mean=(.54,.57,.57), std=(.14,.14,.14) (dataset_h5.py:16-18,
47-48). Also provides a writer so the HDF5 file can be produced from the
directory layout (the reference ships no builder).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import h5py
except Exception:  # pragma: no cover
    h5py = None

# B, G, R (reference dataset_h5.py:16-18)
ISTD_MEAN = np.array([0.54, 0.57, 0.57], dtype=np.float32)
ISTD_STD = np.array([0.14, 0.14, 0.14], dtype=np.float32)


def _require_h5py():
    if h5py is None:
        raise ImportError("h5py is required for the HDF5 dataset path")


class ISTDH5Dataset:
    """Reader for the HDF5 layout; returns float32 normalized arrays."""

    def __init__(self, file: str, subset: str = "train"):
        _require_h5py()
        assert subset in ("train", "test")
        self._h5 = h5py.File(file, "r")[subset]

    def __len__(self) -> int:
        return self._h5["filename"].shape[0]

    def __getitem__(self, idx: int):
        """(filename, input_img, target_img, sp) — HWC float32; images
        mean/std normalized (reference dataset_h5.py:42-65)."""
        img = np.asarray(self._h5["input_img"][idx], dtype=np.float32)
        target = np.asarray(self._h5["target_img"][idx], dtype=np.float32)
        sp = np.asarray(self._h5["sp"][idx], dtype=np.float32)
        name = self._h5["filename"][idx]
        if isinstance(name, bytes):
            name = name.decode()
        img = (img - ISTD_MEAN) / ISTD_STD
        target = (target - ISTD_MEAN) / ISTD_STD
        return name, img, target, sp

    def load_all(self):
        imgs = np.asarray(self._h5["input_img"], dtype=np.float32)
        targets = np.asarray(self._h5["target_img"], dtype=np.float32)
        sps = np.asarray(self._h5["sp"], dtype=np.float32)
        imgs = (imgs - ISTD_MEAN) / ISTD_STD
        targets = (targets - ISTD_MEAN) / ISTD_STD
        return {"img": imgs, "target": targets, "sp": sps}

    def filenames(self) -> list[str]:
        names = self._h5["filename"][:]
        return [n.decode() if isinstance(n, bytes) else str(n)
                for n in names]

    def load_streams(self, datas=("img", "matte", "target")):
        """Bulk-load Trainer-format streams: uint8 (N,H,W,C) per key.

        ``img``/``target`` invert the builder's /255 exactly; ``matte``/
        ``mask`` come from the extension datasets our builder adds
        (build_h5) — files produced by other writers with only the
        reference fields (input_img/target_img/sp) can't feed the
        engine's matte-conditioned D1 and raise a clear error. ``sp``
        (float32) is also selectable for sp-space pipelines.
        """
        out: dict[str, np.ndarray] = {}
        for key in datas:
            if key == "img":
                a = np.asarray(self._h5["input_img"], dtype=np.float32)
                out[key] = np.round(a * 255.0).astype(np.uint8)
            elif key == "target":
                a = np.asarray(self._h5["target_img"], dtype=np.float32)
                out[key] = np.round(a * 255.0).astype(np.uint8)
            elif key in ("matte", "mask"):
                if key not in self._h5:
                    raise KeyError(
                        f"HDF5 file has no {key!r} dataset — rebuild it "
                        "with shadow_removal_istd_tpu.data.h5.build_h5 "
                        "(the reference's dataset_h5 layout carries only "
                        "input_img/target_img/sp)")
                out[key] = np.asarray(self._h5[key], dtype=np.uint8)
            elif key == "sp":
                out[key] = np.asarray(self._h5["sp"], dtype=np.float32)
            else:
                raise KeyError(f"unknown stream {key!r}")
        return out


def build_h5(out_path: str, root_dir: str, subsets=("train", "test"),
             sp_dir: str | None = None) -> None:
    """Build the HDF5 file from the ISTD directory layout.

    ``sp`` is loaded from ``<root>/<subset>/sp/*.npy`` when present
    (the output of tools/preprocess.py), else computed on the fly as
    shadowless/shadowed (reference src/utils.py:45-47).
    """
    _require_h5py()
    from shadow_removal_istd_tpu.data.istd import ISTDDataset
    from shadow_removal_istd_tpu.tools.preprocess import compute_sp

    with h5py.File(out_path, "w") as h5:
        for subset in subsets:
            # extension streams beyond the reference layout: matte/mask
            # (uint8) when their directories exist, so the engine's
            # matte-conditioned pipeline can train from the file.
            extra = [
                s for s in ("matte", "mask")
                if os.path.isdir(os.path.join(
                    root_dir, subset, f"{subset}_{'matte' if s == 'matte' else 'B'}"))
            ]
            ds = ISTDDataset(root_dir, subset=subset,
                             datas=tuple(["img", "target"] + extra))
            data = ds.load_all()
            imgs = data["img"].astype(np.float32) / 255.0
            targets = data["target"].astype(np.float32) / 255.0
            sps = []
            n_loaded = 0
            for i in range(len(ds)):
                stem = os.path.basename(ds.filename(i))
                npy = None
                if sp_dir is not None:
                    # tools/preprocess.py writes
                    # <root>/<subset>/sp/<stem>.npy; also accept the
                    # flat <sp_dir>/<subset>/<stem>.npy layout
                    for cand in (
                            os.path.join(sp_dir, subset, "sp",
                                         f"{stem}.npy"),
                            os.path.join(sp_dir, subset, f"{stem}.npy")):
                        if os.path.isfile(cand):
                            npy = cand
                            break
                if npy is not None:
                    n_loaded += 1
                    sps.append(np.load(npy).astype(np.float32))
                else:
                    sps.append(compute_sp(data["img"][i],
                                          data["target"][i]))
            if sp_dir is not None and n_loaded < len(ds):
                import logging
                logging.getLogger(__name__).warning(
                    "build_h5: %d/%d sp files found under %s for subset "
                    "%s; the rest were recomputed from %s_C_fixed (run "
                    "tools/preprocess.py, or check the layout "
                    "<sp_dir>/<subset>/sp/<stem>.npy)",
                    n_loaded, len(ds), sp_dir, subset, subset)
            grp = h5.create_group(subset)
            grp.create_dataset("input_img", data=imgs)
            grp.create_dataset("target_img", data=targets)
            grp.create_dataset("sp", data=np.stack(sps))
            for s in extra:
                grp.create_dataset(s, data=data[s])
            grp.create_dataset(
                "filename",
                data=np.array([ds.filename(i) for i in range(len(ds))],
                              dtype=h5py.string_dtype()))
