"""Image IO in the reference's conventions.

The reference reads with OpenCV, so training tensors are BGR uint8
(src/dataset.py:100) and outputs are written BGR (src/cgan.py:453-460).
We use cv2 when available and fall back to PIL with an explicit channel
swap so the on-disk and in-memory conventions stay identical.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2 as _cv
except Exception:  # pragma: no cover - cv2 is present in this image
    _cv = None

if _cv is None:
    from PIL import Image


def imread_color(path: str) -> np.ndarray:
    """Read an image as HxWx3 uint8 in BGR order (cv2 convention)."""
    if _cv is not None:
        img = _cv.imread(path, _cv.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return img
    img = np.asarray(Image.open(path).convert("RGB"))
    return img[..., ::-1].copy()  # RGB -> BGR


def imread_gray(path: str) -> np.ndarray:
    """Read an image as HxW uint8 grayscale."""
    if _cv is not None:
        img = _cv.imread(path, _cv.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(path)
        return img
    return np.asarray(Image.open(path).convert("L"))


def imwrite(path: str, img: np.ndarray) -> None:
    """Write a uint8 image; 3-channel input is interpreted as BGR."""
    if _cv is not None:
        ok = _cv.imwrite(path, img)
        if not ok:
            raise IOError(f"failed to write {path}")
        return
    if img.ndim == 3:
        img = img[..., ::-1]  # BGR -> RGB
    Image.fromarray(img).save(path)


def imdecode_color(data: bytes) -> np.ndarray:
    """Decode encoded image bytes (PNG/JPEG/...) to HxWx3 uint8 BGR.

    The in-memory twin of :func:`imread_color` for the serving path,
    where requests arrive as bytes rather than files."""
    if _cv is not None:
        img = _cv.imdecode(np.frombuffer(data, np.uint8), _cv.IMREAD_COLOR)
        if img is None:
            raise ValueError("could not decode image bytes")
        return img
    import io

    img = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return img[..., ::-1].copy()  # RGB -> BGR


def imencode_png(img: np.ndarray) -> bytes:
    """Encode a uint8 image (3-channel interpreted as BGR) to PNG bytes."""
    if _cv is not None:
        ok, buf = _cv.imencode(".png", img)
        if not ok:
            raise IOError("PNG encode failed")
        return buf.tobytes()
    import io

    if img.ndim == 3:
        img = img[..., ::-1]  # BGR -> RGB
    out = io.BytesIO()
    Image.fromarray(img).save(out, format="PNG")
    return out.getvalue()


def normalize_percentile(array: np.ndarray, lower: float = 3.0,
                         upper: float = 97.0) -> np.ndarray:
    """Percentile contrast stretch to uint8 (reference
    ``normalize_ndarray``, src/utils.py:70-74): map the [p_lower,
    p_upper] range of ``array`` onto [0, 255] and clip. Useful for
    visualizing unbounded float maps (e.g. sp arrays)."""
    lo = np.percentile(array, lower)
    hi = np.percentile(array, upper)
    img = (array.astype(np.float64) - lo) / max(hi - lo, 1e-12)
    return (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
