"""Minimal real image codec for the multimodal operators.

The container ships no PIL/libav, so the general decode path stays an
explicit env-gated stub (multimodal.py).  This module provides the REAL
formats the plumbing is exercised on: uncompressed 24-bit BMP
(BITMAPINFOHEADER) and non-interlaced 8-bit PNG (gray/RGB/RGBA, all five
scanline filters, stdlib zlib), decoded in pure numpy — enough to run
decode -> feature-extract -> resize -> re-encode end to end on committed
fixtures without native codecs.  When PIL happens to be importable it is
used as a fallback for other formats.

All functions operate on in-memory bytes/arrays; the Spark side batches
payloads through mapInPandas (multimodal.py), so per-batch numpy work
here is the vectorized inner loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Malformed/truncated media raises more than ValueError from the pure-
# python codecs: struct.error (short headers), KeyError (e.g. a baseline
# JPEG whose second SOS references components the first scan didn't map),
# zlib.error (corrupt PNG IDAT), IndexError/EOFError (truncated streams).
# Every try_decode_* wrapper catches this tuple so one bad payload
# degrades to None (documented contract) instead of killing the Spark job.
DECODE_ERRORS = (
    ValueError,
    KeyError,
    IndexError,
    EOFError,
    OverflowError,
    struct.error,
    zlib.error,
)

# Observability for the degrade-to-None contract (ADVICE r5): genuine
# implementation bugs (KeyError/IndexError/OverflowError) must not vanish
# silently into dropped media.  Suppressed exceptions are counted per
# type (worker-local; read in tests / executor logs) and each NON-
# ValueError type is logged once per worker so a systematic decoder bug
# is visible without flooding stderr on a corrupt corpus.
SUPPRESSED_DECODE_ERRORS: dict[str, int] = {}
_LOGGED_TYPES: set[str] = set()


def note_suppressed_decode_error(exc: BaseException) -> None:
    name = type(exc).__name__
    SUPPRESSED_DECODE_ERRORS[name] = SUPPRESSED_DECODE_ERRORS.get(name, 0) + 1
    if not isinstance(exc, ValueError) and name not in _LOGGED_TYPES:
        _LOGGED_TYPES.add(name)
        import logging

        logging.getLogger(__name__).warning(
            "media decode suppressed %s: %s (further occurrences counted "
            "in SUPPRESSED_DECODE_ERRORS, not logged)", name, exc
        )

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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def is_png(payload: bytes) -> bool:
    return len(payload) >= 8 and bytes(payload[:8]) == PNG_MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG -> (height, width, 3) uint8 RGB array,
    in pure numpy + stdlib zlib (no PIL/libpng).  Supports color types
    0 (gray), 2 (RGB), 6 (RGBA; alpha dropped) and all five scanline
    filters (None/Sub/Up/Average/Paeth).  Raises ValueError on palette,
    16-bit, or interlaced images — those stay behind the env-gated stub.

    Built for fixture-scale correctness testing of the multimodal
    plumbing: per-row unfiltering is a Python loop (Sub/Average/Paeth
    carry an intra-row data dependency), which is fine at that scale.
    """
    import zlib

    b = bytes(payload)
    if not is_png(b):
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(b):
        (length,) = struct.unpack_from(">I", b, pos)
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or comp != 0 or filt != 0:
                raise ValueError(f"unsupported PNG (depth={depth})")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if color_type not in (0, 2, 6):
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (stride + 1):
        raise ValueError("PNG scanline size mismatch")
    raw = raw.reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:  # Up — vectorizable
            rec = (line + prior) & 0xFF
        elif ftype in (1, 3, 4):
            rec = np.zeros(stride, np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                if ftype == 1:  # Sub
                    rec[i] = (line[i] + a) & 0xFF
                elif ftype == 3:  # Average
                    rec[i] = (line[i] + ((a + prior[i]) >> 1)) & 0xFF
                else:  # Paeth
                    c = prior[i - bpp] if i >= bpp else 0
                    rec[i] = (line[i] + _paeth(a, prior[i], c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(height, width, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3].copy()


def png_encode(rgb: np.ndarray, filters: list[int] | None = None) -> bytes:
    """(height, width, 3) uint8 RGB -> non-interlaced 8-bit RGB PNG.
    ``filters`` optionally gives the per-row filter type (0-4, cycled) —
    used by tests to exercise every unfilter path in ``png_decode``."""
    import zlib

    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) array")
    h, w = rgb.shape[:2]
    stride = w * 3
    flat = rgb.reshape(h, stride).astype(np.int32)
    filters = filters or [0]
    lines = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        prior = flat[y - 1] if y > 0 else np.zeros(stride, np.int32)
        left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prior) & 0xFF
        elif f == 3:
            enc = (cur - ((left + prior) >> 1)) & 0xFF
        elif f == 4:
            upleft = np.concatenate([np.zeros(3, np.int32), prior[:-3]])
            pred = np.array(
                [_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prior, upleft)],
                dtype=np.int32,
            )
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(f)
        lines += enc.astype(np.uint8).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def try_decode_image(payload: bytes) -> np.ndarray | None:
    """Real decode when possible: BMP, non-interlaced 8-bit PNG, and
    baseline JPEG natively (all pure numpy); any PIL-supported format if
    PIL is importable; None when no decoder applies."""
    b = bytes(payload)
    if is_bmp(b):
        try:
            return bmp_decode(b)
        except DECODE_ERRORS as _e:
            note_suppressed_decode_error(_e)
            return None
    if is_png(b):
        try:
            return png_decode(b)
        except DECODE_ERRORS as _e:
            note_suppressed_decode_error(_e)
            return None
    from simplir_spark.functions.jpegcodec import decode_jpeg, is_jpeg

    if is_jpeg(b):
        try:
            return decode_jpeg(b)
        except DECODE_ERRORS as _e:
            note_suppressed_decode_error(_e)
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
