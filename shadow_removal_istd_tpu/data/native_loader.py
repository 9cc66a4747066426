"""ctypes binding for the native batch PNG decoder (native/).

The native component of the host pipeline: a C++ thread pool decodes a
whole file list straight into one contiguous uint8 batch buffer (BGR,
cv2 convention), ready for a single host->device transfer — the
counterpart of the reference's torch DataLoader C++ workers.

Falls back cleanly when the shared library can't be built (callers use
``is_available()``); ``build()`` compiles it on demand with make/g++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsrit_loader.so")

_lib = None


def build(force: bool = False) -> bool:
    """Compile the shared library; returns success."""
    if os.path.isfile(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None  # don't re-run a failing `make` on every call
    if not os.path.isfile(_LIB_PATH) and not build():
        _load_failed = True
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.srit_png_probe.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.srit_png_probe.restype = ctypes.c_int
    lib.srit_png_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int)]
    lib.srit_png_decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def probe(path: str) -> tuple[int, int, int]:
    """(height, width, source_channels) of a PNG."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.srit_png_probe(path.encode(), ctypes.byref(h),
                            ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise IOError(f"probe failed ({rc}): {path}")
    return h.value, w.value, c.value


def decode_batch(paths: list[str], gray: bool = False,
                 n_threads: int | None = None) -> np.ndarray:
    """Decode PNGs into a stacked (N, H, W, C) uint8 array (BGR order
    for color, matching cv2). All files must share one resolution."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    if not paths:
        raise ValueError("empty path list")
    h, w, _ = probe(paths[0])
    out_c = 1 if gray else 3
    out = np.empty((len(paths), h, w, out_c), np.uint8)
    status = (ctypes.c_int * len(paths))()
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    failures = lib.srit_png_decode_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, out_c, 1, n_threads, status)
    if failures:
        bad = [(paths[i], status[i]) for i in range(len(paths))
               if status[i] != 0]
        raise IOError(f"{failures} PNGs failed to decode: {bad[:5]}")
    return out
