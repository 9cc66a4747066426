"""ISTD directory dataset.

Layout (reference src/dataset.py:43-46):
``<root>/<subset>/<subset>_A``       shadow images (BGR)
``<root>/<subset>/<subset>_B``       binary shadow masks (gray)
``<root>/<subset>/<subset>_matte``   shadow mattes (gray)
``<root>/<subset>/<subset>_C_fixed`` color-fixed shadow-free targets (BGR)

Files are aligned by sorting on the stem (reference src/dataset.py:49-56).
Selectable streams mirror the reference ``datas`` list; sample tuples are
ordered by *sorted stream name*, the convention the engine unpacks
(reference src/dataset.py:130, src/cgan.py:265: img, matte, target).

TPU-first design: the dataset returns stacked uint8 numpy arrays (all
ISTD images share one resolution per split) so whole batches ship to the
device as single contiguous uint8 buffers; augmentation and [-1,1]
normalization run on device. ``preload=True`` keeps the full split in
host RAM (~1.2 GB for ISTD train).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from shadow_removal_istd_tpu.utils.image_io import imread_color, imread_gray

STREAM_DIRS = {
    "img": "{s}_A",
    "mask": "{s}_B",
    "matte": "{s}_matte",
    "target": "{s}_C_fixed",
}
GRAY_STREAMS = {"mask", "matte"}


def _list_aligned(directory: str) -> list[str]:
    return sorted(os.listdir(directory),
                  key=lambda f: os.path.splitext(f)[0])


@dataclass
class ISTDDataset:
    """Aligned multi-stream ISTD reader."""

    root_dir: str
    subset: str = "train"
    datas: tuple[str, ...] = ("img", "mask", "target")
    preload: bool = False
    name: str | None = None
    _files: dict = field(init=False, default_factory=dict)
    _cache: dict = field(init=False, default_factory=dict)

    def __post_init__(self):
        assert self.subset in ("train", "test")
        base = os.path.join(self.root_dir, self.subset)
        counts = set()
        for stream in self.datas:
            d = os.path.join(base, STREAM_DIRS[stream].format(s=self.subset))
            files = _list_aligned(d)
            self._files[stream] = [os.path.join(d, f) for f in files]
            counts.add(len(files))
        if len(counts) != 1:
            raise ValueError(
                f"misaligned ISTD streams under {base}: sizes {counts}")
        # sample tuple ordering = sorted stream names (reference
        # src/dataset.py:130)
        self.streams = tuple(sorted(self.datas))
        if self.preload:
            for stream in self.streams:
                self._cache[stream] = [self._read(stream, i)
                                       for i in range(len(self))]

    def _read(self, stream: str, idx: int) -> np.ndarray:
        path = self._files[stream][idx]
        if stream in GRAY_STREAMS:
            arr = imread_gray(path)[..., None]
        else:
            arr = imread_color(path)
        return arr

    def __len__(self) -> int:
        return len(self._files[self.datas[0]])

    def filename(self, idx: int) -> str:
        # any stream works: files align by stem across streams. Not
        # hard-coded to "img" so mask-/target-only datasets (e.g. the
        # engine's protocol-mask loader) support item access too.
        files = next(iter(self._files.values()))
        stem = os.path.splitext(os.path.basename(files[idx]))[0]
        return os.path.join(self.name, stem) if self.name else stem

    def __getitem__(self, idx: int):
        """(filename, *streams) — uint8 HWC arrays, sorted-stream order."""
        arrays = []
        for stream in self.streams:
            if self.preload:
                arrays.append(self._cache[stream][idx])
            else:
                arrays.append(self._read(stream, idx))
        return (self.filename(idx), *arrays)

    def load_all(self, native: bool = True) -> dict[str, np.ndarray]:
        """Stack every stream into one uint8 array per stream
        (N, H, W, C) — the device-cache/bulk-pipeline entry point.

        Uses the native threaded PNG decoder (native/png_decoder.cpp)
        when available — one contiguous buffer per stream, decoded in
        parallel, bit-identical to the cv2 path.
        """
        native_dec = None
        if native and not self.preload:
            try:
                from shadow_removal_istd_tpu.data import native_loader
                if native_loader.is_available():
                    native_dec = native_loader
            except Exception:
                native_dec = None

        out = {}
        for stream in self.streams:
            if native_dec is not None and all(
                    p.lower().endswith(".png")
                    for p in self._files[stream]):
                try:
                    out[stream] = native_dec.decode_batch(
                        self._files[stream],
                        gray=stream in GRAY_STREAMS)
                    continue
                except IOError:
                    # e.g. a gray stream stored as RGB PNGs: the
                    # native decoder refuses (cv2's PNG rgb->gray is
                    # not reproducible bit-exactly); use cv2 below
                    pass
            if self.preload:
                items = self._cache[stream]
            else:
                items = [self._read(stream, i) for i in range(len(self))]
            out[stream] = np.stack(items, axis=0)
        return out
