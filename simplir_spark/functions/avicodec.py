"""Pure-python MJPEG-in-AVI video codec (no external media libraries).

AVI is a RIFF container; MJPEG stores each frame as an independent
baseline JPEG — which :mod:`simplir_spark.functions.jpegcodec` already
decodes.  Together they give the multimodal pipeline a REAL video path
(container parse -> frame extraction -> per-frame JPEG decode) with zero
new dependencies, replacing the fake-only stub for this format; other
video codecs still need libav and stay behind the explicit
NotImplementedError stub.

The writer emits the minimal standards-shaped file (hdrl with avih +
one vids/MJPG stream, movi with 00dc chunks, idx1 index) used to build
committed test fixtures; the reader is a generic RIFF walker that
tolerates extra chunks and reads frame rate from strh (rate/scale) with
an avih microsec-per-frame fallback.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

AVI_MAGIC_RIFF = b"RIFF"
AVI_FORM = b"AVI "


def is_avi(payload: bytes) -> bool:
    b = bytes(payload)
    return len(b) >= 12 and b[:4] == AVI_MAGIC_RIFF and b[8:12] == AVI_FORM


@dataclass
class VideoClip:
    frames: list[bytes]  # one encoded JPEG per frame
    fps: float
    width: int
    height: int

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        if self.fps <= 0:
            return 0
        return int(round(self.n_frames * 1000.0 / self.fps))


def _walk_riff(data: bytes, start: int, end: int):
    """Yield (fourcc, formtype_or_None, body_start, body_end) for each
    chunk in [start, end); callers recurse into RIFF/LIST bodies."""
    i = start
    while i + 8 <= end:
        fourcc = data[i : i + 4]
        size = struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = i + 8
        if fourcc in (b"RIFF", b"LIST"):
            yield fourcc, data[body : body + 4], body + 4, body + size
        else:
            yield fourcc, None, body, body + size
        i = body + size + (size & 1)  # chunks pad to even length


def avi_decode_mjpeg(payload: bytes) -> VideoClip:
    """MJPEG AVI -> VideoClip of per-frame JPEG payloads."""
    d = bytes(payload)
    if not is_avi(d):
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []
    scale = rate = 0
    usec_per_frame = 0
    width = height = 0
    handler = b""

    def recurse(start: int, end: int) -> None:
        nonlocal scale, rate, usec_per_frame, width, height, handler
        for fourcc, form, b0, b1 in _walk_riff(d, start, end):
            if fourcc in (b"RIFF", b"LIST"):
                recurse(b0, min(b1, len(d)))
            elif fourcc == b"avih" and b1 - b0 >= 40:
                usec_per_frame = struct.unpack("<I", d[b0 : b0 + 4])[0]
                width = struct.unpack("<I", d[b0 + 32 : b0 + 36])[0]
                height = struct.unpack("<I", d[b0 + 36 : b0 + 40])[0]
            elif fourcc == b"strh" and b1 - b0 >= 32 and d[b0 : b0 + 4] == b"vids":
                handler = d[b0 + 4 : b0 + 8]
                scale, rate = struct.unpack("<II", d[b0 + 20 : b0 + 28])
            elif len(fourcc) == 4 and fourcc[2:] in (b"dc", b"db"):
                frames.append(d[b0:b1])

    recurse(12, len(d))
    if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00", b""):
        raise ValueError(f"unsupported AVI video handler {handler!r}")
    if not frames:
        raise ValueError("AVI contains no video frames")
    if rate and scale:
        fps = rate / scale
    elif usec_per_frame:
        fps = 1_000_000.0 / usec_per_frame
    else:
        raise ValueError("AVI missing frame-rate information")
    return VideoClip(frames=frames, fps=fps, width=width, height=height)


def avi_encode_mjpeg(
    frames: list[bytes], fps: float, width: int, height: int
) -> bytes:
    """Per-frame JPEG payloads -> minimal MJPEG AVI bytes."""
    if not frames:
        raise ValueError("no frames")
    if fps <= 0:
        raise ValueError("fps must be positive")
    if not (0 < width < 32768 and 0 < height < 32768):
        # rcFrame is signed 16-bit in the stream header
        raise ValueError(f"AVI dimensions out of range: {width}x{height}")
    scale, rate = 1000, int(round(fps * 1000))
    max_frame = max(len(f) for f in frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        int(round(1_000_000 / fps)),
        int(max_frame * fps),
        0,
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,
        1,
        max_frame,
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0, len(frames), max_frame, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    idx_entries = []
    off = 4  # offsets relative to the start of the movi list data
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    body = AVI_FORM + hdrl + movi + idx1
    return AVI_MAGIC_RIFF + struct.pack("<I", len(body)) + body


def try_decode_video(payload: bytes) -> VideoClip | None:
    """Real decode when possible: MJPEG AVI natively; None otherwise."""
    b = bytes(payload)
    from simplir_spark.functions.imagecodec import (
        DECODE_ERRORS,
        note_suppressed_decode_error,
    )

    if is_avi(b):
        try:
            return avi_decode_mjpeg(b)
        except DECODE_ERRORS as _e:
            note_suppressed_decode_error(_e)
            return None
    return None


def video_features(clip: VideoClip, dim: int = 8) -> list[float]:
    """Deterministic per-clip feature vector: [n_frames, fps] + the image
    features of the MIDDLE frame (decoded with the pure-numpy JPEG
    codec) — the video mirror of image_features/audio_features."""
    from simplir_spark.functions.imagecodec import image_features
    from simplir_spark.functions.jpegcodec import decode_jpeg

    from simplir_spark.functions.imagecodec import (
        DECODE_ERRORS,
        note_suppressed_decode_error,
    )

    base = [float(clip.n_frames), float(clip.fps)]
    if dim > len(base):
        try:
            mid = decode_jpeg(clip.frames[clip.n_frames // 2])
        except DECODE_ERRORS as _e:
            # container parsed but the middle frame is corrupt/unsupported:
            # degrade the pixel-derived tail to zeros instead of killing
            # the whole mapInPandas batch (the try_decode contract)
            note_suppressed_decode_error(_e)
            base += [0.0] * (dim - len(base))
        else:
            base += image_features(mid, dim - len(base))
    return base[:dim]
