"""Minimal real image codec for the multimodal operators.

The container ships no PIL/libav, so the general decode path stays an
explicit env-gated stub (multimodal.py).  This module provides the one
REAL format the plumbing is exercised on: uncompressed 24-bit BMP
(BITMAPINFOHEADER), decoded and encoded in pure numpy — enough to run
decode -> feature-extract -> resize -> re-encode end to end on a
committed fixture without native codecs.  When PIL happens to be
importable it is used as a fallback for other formats.

All functions operate on in-memory bytes/arrays; the Spark side batches
payloads through mapInPandas (multimodal.py), so per-batch numpy work
here is the vectorized inner loop.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"


def is_bmp(payload: bytes) -> bool:
    return len(payload) >= 2 and bytes(payload[:2]) == BMP_MAGIC


def bmp_decode(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (height, width, 3) uint8 RGB array.

    Supports BITMAPINFOHEADER (and larger DIB headers with the same
    leading layout), bottom-up and top-down row order, 4-byte row
    padding.  Raises ValueError on anything else.
    """
    b = bytes(payload)
    if not is_bmp(b) or len(b) < 54:
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", b, 10)[0]
    dib_size = struct.unpack_from("<I", b, 14)[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (planes={planes}, bpp={bpp}, compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate BMP dimensions")
    row_bytes = (width * 3 + 3) & ~3
    need = data_offset + row_bytes * height
    if len(b) < need:
        raise ValueError("truncated BMP payload")
    raw = np.frombuffer(b, dtype=np.uint8, count=row_bytes * height, offset=data_offset)
    rows = raw.reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def bmp_encode(rgb: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) array")
    h, w = rgb.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    img = np.zeros((h, row_bytes), dtype=np.uint8)
    img[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR, bottom-up
    pixel_bytes = img.tobytes()
    data_offset = 14 + 40
    header = struct.pack(
        "<2sIHHI", BMP_MAGIC, data_offset + len(pixel_bytes), 0, 0, data_offset
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + dib + pixel_bytes


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — pure index math."""
    h, w = rgb.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return rgb[np.ix_(ys, xs)]


def try_decode_image(payload: bytes) -> np.ndarray | None:
    """Real decode when possible: BMP natively, any PIL-supported format
    if PIL is importable; None when no decoder applies."""
    b = bytes(payload)
    if is_bmp(b):
        try:
            return bmp_decode(b)
        except ValueError:
            return None
    try:  # optional dependency — absent in this container
        import io

        from PIL import Image  # type: ignore
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(b)) as im:
            return np.asarray(im.convert("RGB"))
    except Exception:
        return None


def image_features(rgb: np.ndarray, dim: int = 8) -> list[float]:
    """Deterministic per-image feature vector from decoded pixels:
    [width, height, mean_R, mean_G, mean_B, std_R, std_G, std_B, ...]
    padded/truncated to ``dim`` (padding repeats a grayscale histogram)."""
    h, w = rgb.shape[:2]
    px = rgb.reshape(-1, 3).astype(np.float64)
    base = [float(w), float(h)] + px.mean(axis=0).tolist() + px.std(axis=0).tolist()
    if dim > len(base):
        gray = px.mean(axis=1)
        hist, _ = np.histogram(gray, bins=dim - len(base), range=(0.0, 255.0))
        total = max(1, len(gray))
        base += (hist / total).tolist()
    return base[:dim]
