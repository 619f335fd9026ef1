"""Pure-numpy baseline JPEG codec (no external imaging libraries).

Decoder: baseline sequential DCT (SOF0) with the real-world feature set —
arbitrary per-component sampling factors (4:2:0 / 4:2:2 / 4:4:4),
file-declared Huffman and quantization tables (8- or 16-bit), restart
markers, grayscale or 3-component YCbCr.  Progressive (SOF2) raises
ValueError (document + fall through to the stub path).  Entropy decoding
is a per-symbol Python loop (inherently bit-serial); everything after it
— dequantize, inverse zigzag, IDCT, level shift, upsample, color
transform — is vectorized numpy over all blocks at once.

Encoder: baseline 4:4:4 with SELF-DECLARED simple canonical Huffman
tables (all DC symbols at code length 4, all AC symbols at length 8 —
valid prefix codes a conformant decoder reads from the DHT segments, so
no reliance on the spec's example tables) and a deterministic
quality-scaled quantization matrix.  ~2x larger files than an optimized
encoder — it exists to generate committed fixtures and round-trip tests,
not to compete with libjpeg.

Validation: the decoder is cross-checked against Java ImageIO through
Spark's built-in ``image`` data source on JPEGs shipped with the Apache
Spark distribution (tests/test_streaming_multimodal.py) — an independent
reference decoder that lives in the JVM we already run.

Reference parity note: the reference pipeline treats media as opaque
payloads; this codec exists for the LLM-data-pipeline multimodal brief
(decode/feature/resize plumbing over binary columns).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"


def is_jpeg(payload: bytes) -> bool:
    return len(payload) >= 2 and bytes(payload[:2]) == JPEG_MAGIC


# zigzag scan order: _ZIGZAG[i] = (row-major) position of the i-th
# zigzag-ordered coefficient, built procedurally (no table to mistype)
def _zigzag_order() -> np.ndarray:
    order = []
    for s in range(15):
        ks = range(max(0, s - 7), min(s, 7) + 1)
        diag = [(k, s - k) for k in ks]
        if s % 2 == 0:
            diag.reverse()
        order.extend(r * 8 + c for r, c in diag)
    return np.asarray(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8, dtype=np.float64)
    u = x[:, None]
    c = np.cos((2 * x[None, :] + 1) * u * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= np.sqrt(0.5)
    return c  # forward: C @ block @ C.T ; inverse: C.T @ coef @ C


_DCT = _dct_matrix()


def _extend(v: int, t: int) -> int:
    """JPEG F.12 sign extension of a t-bit magnitude code."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


class _BitReader:
    """Bit cursor over unstuffed entropy-coded bytes, with recorded
    byte-aligned restart-interval offsets."""

    def __init__(self, data: bytes, restarts: list[int]):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0
        self.restarts = restarts  # byte offsets of interval starts
        self.next_restart = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            raise ValueError("truncated JPEG scan")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("truncated JPEG scan")
        chunk = self.bits[self.pos : self.pos + n]
        self.pos += n
        v = 0
        for b in chunk:
            v = (v << 1) | int(b)
        return v

    def align_to_restart(self) -> None:
        if self.next_restart >= len(self.restarts):
            raise ValueError("missing expected restart marker")
        self.pos = self.restarts[self.next_restart] * 8
        self.next_restart += 1


def _build_huff(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """Canonical (length, code) -> symbol map from a DHT segment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (height, width, 3) uint8 RGB (grayscale is
    replicated across channels)."""
    d = bytes(payload)
    if not is_jpeg(d):
        raise ValueError("not a JPEG payload")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, comps) ; comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    scan = None
    while i + 1 < len(d):
        if d[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = d[i + 1]
        if m == 0xFF:  # fill byte padding before a marker (T.81 B.1.1.2)
            i += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        seglen = struct.unpack(">H", d[i + 2 : i + 4])[0]
        seg = d[i + 4 : i + 2 + seglen]
        if m == 0xC2:
            raise ValueError("progressive JPEG not supported")
        if m in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0x{m:02x}")
        if m == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    vals = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int64)
                    j += 128
                else:
                    vals = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int64)
                    j += 64
                qt[tq] = vals  # zigzag order as stored
        elif m == 0xC0:  # SOF0
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif m == 0xC4:  # DHT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                values = list(seg[j + 17 : j + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_huff(bits, values)
                j += 17 + n
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif m == 0xDA:  # SOS — entropy-coded data follows
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 15))
            # unstuff + find scan end / restart offsets
            data = bytearray()
            restarts: list[int] = []
            j = i + 2 + seglen
            while j < len(d) - 1:
                b = d[j]
                if b == 0xFF:
                    nxt = d[j + 1]
                    if nxt == 0x00:
                        data.append(0xFF)
                        j += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        restarts.append(len(data))
                        j += 2
                        continue
                    break  # EOI or next marker
                data.append(b)
                j += 1
            scan = (scan_comps, bytes(data), restarts)
            break
        i += 2 + seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("degenerate JPEG dimensions")
    scan_comps, data, restarts = scan
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    if any(hmax % hs or vmax % vs for _, hs, vs, _ in comps):
        raise ValueError("non-integer JPEG sampling ratio")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    tabsel = {cs: (td, ta) for cs, td, ta in scan_comps}

    reader = _BitReader(data, restarts)
    n_comp = len(comps)
    coeffs: list[list[np.ndarray]] = [[] for _ in range(n_comp)]
    block_pos: list[list[tuple[int, int]]] = [[] for _ in range(n_comp)]
    pred = [0] * n_comp
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_to_restart()
                pred = [0] * n_comp
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                td, ta = tabsel[cid]
                dc_tab, ac_tab = huff_dc[td], huff_ac[ta]
                for v in range(vs):
                    for u in range(hs):
                        blk = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.read_bits(t), t)
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        kk = 1
                        while kk < 64:
                            rs = _huff_decode(reader, ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    kk += 16
                                    continue
                                break  # EOB
                            kk += r
                            if kk > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[kk] = _extend(reader.read_bits(s), s)
                            kk += 1
                        coeffs[ci].append(blk)
                        block_pos[ci].append((my * vs + v, mx * hs + u))
            mcu_count += 1

    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        arr = np.stack(coeffs[ci])  # (n, 64) zigzag order
        deq = (arr * qt[tq][None, :]).astype(np.float64)
        blocks = deq[:, _UNZIGZAG].reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT) + 128.0
        plane = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        for (by, bx), block in zip(block_pos[ci], pix):
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes.append(plane[:h, :w])

    if n_comp == 1:
        gray = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([gray, gray, gray], axis=2)
    if n_comp != 3:
        raise ValueError(f"unsupported JPEG component count {n_comp}")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

# self-declared canonical tables: all 12 DC symbols at code length 4, all
# 162 AC run/size symbols at length 8 (both leave the all-ones code
# unassigned, so trailing 1-padding can't decode as a spurious symbol)
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _enc_tables():
    dc_bits = [0] * 16
    dc_bits[3] = len(_DC_SYMS)  # length 4
    ac_bits = [0] * 16
    ac_bits[7] = len(_AC_SYMS)  # length 8
    dc_codes = {sym: (4, idx) for idx, sym in enumerate(_DC_SYMS)}
    ac_codes = {sym: (8, idx) for idx, sym in enumerate(_AC_SYMS)}
    return (dc_bits, _DC_SYMS, dc_codes), (ac_bits, _AC_SYMS, ac_codes)


def _quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Deterministic quality-scaled matrix: coarser with distance from DC,
    coarser for chroma, quality 1..100 maps to a 1..255-clipped scale."""
    quality = min(100, max(1, int(quality)))
    scale = (101 - quality) * (0.6 if not chroma else 0.9)
    u = np.arange(8)
    base = 1.0 + (u[:, None] + u[None, :]) * scale
    return np.clip(np.round(base), 1, 255).astype(np.int64)


def _mag_code(v: int) -> tuple[int, int]:
    """(size t, t-bit magnitude code) per JPEG F.1.2.1/F.1.2.2."""
    t = int(abs(v)).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


def encode_jpeg(rgb: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline 4:4:4 JFIF bytes."""
    rgb = np.asarray(rgb, dtype=np.float64)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("degenerate image")
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _quant_table(quality, False), _quant_table(quality, True)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8

    def to_blocks(plane, q):
        p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        blocks = blocks.reshape(-1, 8, 8)
        coef = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
        qz = np.round(coef / q[None]).astype(np.int64)
        return qz.reshape(-1, 64)[:, _ZIGZAG]  # zigzag-ordered rows

    comps = [to_blocks(y, qy), to_blocks(cb, qc), to_blocks(cr, qc)]
    (dc_bits, dc_vals, dc_codes), (ac_bits, ac_vals, ac_codes) = _enc_tables()
    wtr = _BitWriter()
    pred = [0, 0, 0]
    n_blocks = comps[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(3):
            blk = comps[ci][bi]
            t, code = _mag_code(int(blk[0]) - pred[ci])
            pred[ci] = int(blk[0])
            length, huff = dc_codes[t]
            wtr.write(huff, length)
            if t:
                wtr.write(code, t)
            run = 0
            nz = np.nonzero(blk[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for kk in range(1, last + 1):
                v = int(blk[kk])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    length, huff = ac_codes[0xF0]
                    wtr.write(huff, length)
                    run -= 16
                t, code = _mag_code(v)
                length, huff = ac_codes[(run << 4) | t]
                wtr.write(huff, length)
                wtr.write(code, t)
                run = 0
            if last < 63:
                length, huff = ac_codes[0x00]
                wtr.write(huff, length)
    scan_data = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    out += seg(0xDB, bytes([0x01]) + bytes(qc.reshape(-1)[_ZIGZAG].astype(np.uint8)))
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tc, th, (bits, vals) in (
        (0, 0, (dc_bits, dc_vals)),
        (1, 0, (ac_bits, ac_vals)),
        (0, 1, (dc_bits, dc_vals)),
        (1, 1, (ac_bits, ac_vals)),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan_data
    out += b"\xff\xd9"
    return bytes(out)
