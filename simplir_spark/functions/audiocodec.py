"""Pure-numpy WAV (RIFF/PCM) codec — the audio analog of imagecodec.

The multimodal brief carries audio as opaque ``binary`` payloads; this
container has no libsndfile/ffmpeg, but uncompressed PCM WAV needs only
byte arithmetic, so — like the BMP/PNG image path — the decode step is
REAL here with zero new dependencies.  Scope: RIFF/WAVE with a PCM
``fmt `` chunk (format tag 1), 8-bit unsigned or 16-bit signed samples,
any channel count; other formats return None from ``try_decode_audio``
and the caller falls back to its explicit stub.

Everything operates on float64 arrays in [-1, 1] shaped (n_frames,
n_channels), vectorized — these kernels run inside mapInPandas batches
on executors, so per-sample Python loops are not acceptable.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class AudioClip:
    """Decoded PCM audio: samples in [-1, 1], shape (n_frames, n_channels)."""

    samples: np.ndarray
    sample_rate: int

    @property
    def n_frames(self) -> int:
        return int(self.samples.shape[0])

    @property
    def n_channels(self) -> int:
        return int(self.samples.shape[1])

    @property
    def duration_ms(self) -> int:
        return int(round(self.n_frames * 1000.0 / self.sample_rate))


def is_wav(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def wav_decode(payload: bytes) -> AudioClip:
    """Decode a PCM WAV payload (walks RIFF chunks; tolerates extra
    chunks like LIST/fact before or after data)."""
    b = bytes(payload)
    if not is_wav(b):
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(b)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format tag {audio_format} (PCM only)")
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("invalid channel count / sample rate")
    if bits == 16:
        raw = np.frombuffer(data[: len(data) - len(data) % (2 * n_channels)], "<i2")
        samples = raw.astype(np.float64) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(data[: len(data) - len(data) % n_channels], np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported bit depth {bits} (8/16 only)")
    n_frames = samples.size // n_channels
    return AudioClip(samples[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate)


def wav_encode(clip: AudioClip, bits: int = 16) -> bytes:
    """Encode to PCM WAV; inverse of wav_decode for supported depths."""
    s = np.clip(clip.samples, -1.0, 1.0)
    if bits == 16:
        pcm = np.round(s * 32767.0).astype("<i2").tobytes()
    elif bits == 8:
        pcm = (np.round(s * 127.0) + 128.0).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    n_channels = clip.n_channels
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, clip.sample_rate,
        clip.sample_rate * block_align, block_align, bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm + (b"\x00" if len(pcm) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def resample_linear(clip: AudioClip, target_rate: int) -> AudioClip:
    """Linear-interpolation resample (np.interp per channel) — the audio
    analog of imagecodec.resize_nearest; deterministic and dependency-free."""
    if target_rate == clip.sample_rate:
        return clip
    if clip.n_frames == 0:
        # a structurally valid WAV with an empty data chunk: np.interp
        # would raise on an empty sample-point array, and there is
        # nothing to resample — pass the emptiness through at the rate
        # the caller asked for
        return AudioClip(clip.samples.copy(), target_rate)
    n_out = max(1, int(round(clip.n_frames * target_rate / clip.sample_rate)))
    src_t = np.arange(clip.n_frames, dtype=np.float64)
    dst_t = np.linspace(0.0, max(0, clip.n_frames - 1), n_out)
    out = np.stack(
        [np.interp(dst_t, src_t, clip.samples[:, c]) for c in range(clip.n_channels)],
        axis=1,
    )
    return AudioClip(out, target_rate)


def try_decode_audio(payload: bytes) -> AudioClip | None:
    """Real decode when possible (PCM WAV), else None — mirrors
    imagecodec.try_decode_image's contract so multimodal dispatch can
    chain the two."""
    b = bytes(payload)
    if not is_wav(b):
        return None
    from simplir_spark.functions.imagecodec import (
        DECODE_ERRORS,
        note_suppressed_decode_error,
    )

    try:
        return wav_decode(b)
    except DECODE_ERRORS as _e:
        note_suppressed_decode_error(_e)
        return None


def audio_features(clip: AudioClip, dim: int = 8) -> list[float]:
    """Deterministic per-clip feature vector from decoded samples:
    [duration_sec, sample_rate, n_channels, rms, peak, zero_cross_rate,
    ...] padded to ``dim`` with an energy profile over equal time bins —
    the audio mirror of imagecodec.image_features."""
    mono = clip.samples.mean(axis=1)
    n = max(1, mono.size)
    rms = float(np.sqrt(np.mean(mono * mono))) if mono.size else 0.0
    peak = float(np.max(np.abs(mono))) if mono.size else 0.0
    zcr = float(np.count_nonzero(np.diff(np.signbit(mono)))) / n
    base = [
        float(clip.n_frames) / clip.sample_rate,
        float(clip.sample_rate),
        float(clip.n_channels),
        rms,
        peak,
        zcr,
    ]
    if dim > len(base):
        k = dim - len(base)
        # energy per equal-width time bin, normalized by total energy
        # linspace(0, n, k+1)[:-1] is strictly < n for n >= 1, so the
        # reduceat start indices are always in range
        edges = np.linspace(0, mono.size, k + 1).astype(np.int64)
        e = np.add.reduceat(mono * mono, edges[:-1]) if mono.size else np.zeros(k)
        tot = float(e.sum()) or 1.0
        base += (e / tot).tolist()
    return base[:dim]
