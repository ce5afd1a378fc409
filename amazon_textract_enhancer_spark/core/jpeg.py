"""Minimal pure-stdlib baseline JPEG codec (grayscale, 8-bit).

The last named codec on the stub seam: a real DCT + entropy decoder —
marker parsing (SOI/DQT/SOF0/DHT/SOS/EOI), canonical Huffman decode
(spec Annex K tables on encode; tables are READ FROM THE STREAM on
decode), byte unstuffing (FF 00), DC difference coding, zigzag,
dequantization and a separable float IDCT with level shift.

Oracle strategy (operators/multimodal.py): JPEG is lossy in general,
but a block that is CONSTANT has only a DC coefficient, and with the
spec's luminance DC quant step of 16 the value survives exactly when
(v−128) is even: FDCT DC = 8·(v−128), quantize = (v−128)/2 exactly,
dequant·IDCT = v−128, level shift = v. The fixture images are built
from constant 8×8 blocks of even values, so Spark's decode of the
actual entropy-coded bytes must reproduce the closed-form pixel
formula bit-exactly — while the full AC path (run/size symbols, EOB,
stuffing) is exercised by round-trip PSNR fuzz in the unit tests.

Supported: baseline sequential (SOF0), single 8-bit component, no
restart markers. Anything else raises ValueError.
"""

from __future__ import annotations

import math
import struct

# ITU-T T.81 Table K.1 (luminance quantization, quality 50)
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# zigzag order: index i in scan order -> position in the 8x8 block
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 canonical Huffman tables (luminance)
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7

# DCT basis as a matrix: _M[u][x] = 0.5 * C(u) * cos((2x+1)uπ/16), so
# FDCT = M · block · Mᵀ and IDCT = Mᵀ · coef · M — used by the NumPy
# fast path (the pure-Python loops remain as the reference / fallback)
_M = [[0.5 * _C[u] * _COS[x][u] for x in range(8)] for u in range(8)]

try:  # NumPy is available in this environment; keep a fallback anyway
    import numpy as _np

    _M_NP = _np.array(_M)
except Exception:  # pragma: no cover
    _np = None


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) per the canonical JPEG construction."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code, length) → value, for stream decoding."""
    return {cl: v for v, cl in _canonical_codes(bits, vals).items()}


class _BitWriterMSB:
    """MSB-first bit packing with JPEG byte stuffing (FF → FF 00)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
        return bytes(self.out)


class _BitReaderMSB:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:  # stuffed byte: FF must be followed by 00
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("JPEG: unexpected marker in scan")
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _fdct(block: list[int]) -> list[float]:
    if _np is not None:
        b = _np.array(block, dtype=_np.float64).reshape(8, 8) - 128.0
        return (_M_NP @ b @ _M_NP.T).reshape(64).tolist()
    shifted = [b - 128 for b in block]
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += shifted[x * 8 + y] * _COS[x][u] * _COS[y][v]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[int]:
    if _np is not None:
        f = _np.array(coef, dtype=_np.float64).reshape(8, 8)
        px = _np.rint(_M_NP.T @ f @ _M_NP) + 128
        return _np.clip(px, 0, 255).astype(_np.int64).reshape(64).tolist()
    out = []
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += _C[u] * _C[v] * coef[u * 8 + v] * _COS[x][u] * _COS[y][v]
            px = round(0.25 * s) + 128
            out.append(0 if px < 0 else 255 if px > 255 else px)
    return out


def encode_jpeg_gray(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit grayscale, row-major → baseline JFIF-less JPEG stream
    (SOI DQT SOF0 DHT×2 SOS …entropy… EOI)."""
    if len(pixels) != width * height:
        raise ValueError("JPEG: pixel buffer != width*height")
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriterMSB()
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            block = []
            for y in range(8):
                for x in range(8):
                    sy = min(by * 8 + y, height - 1)  # edge replication
                    sx = min(bx * 8 + x, width - 1)
                    block.append(pixels[sy * width + sx])
            coef = _fdct(block)
            q = [round(coef[ZIGZAG[i]] / QUANT_LUMA[ZIGZAG[i]])
                 for i in range(64)]
            diff = q[0] - prev_dc
            prev_dc = q[0]
            cat = _category(diff)
            code, ln = dc_codes[cat]
            w.write(code, ln)
            if cat:
                w.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
            run = 0
            last_nz = max((i for i in range(1, 64) if q[i]), default=0)
            for i in range(1, last_nz + 1):
                if q[i] == 0:
                    run += 1
                    if run == 16:
                        code, ln = ac_codes[0xF0]  # ZRL
                        w.write(code, ln)
                        run = 0
                    continue
                cat = _category(q[i])
                code, ln = ac_codes[(run << 4) | cat]
                w.write(code, ln)
                v = q[i]
                w.write(v if v > 0 else v + (1 << cat) - 1, cat)
                run = 0
            if last_nz < 63:
                code, ln = ac_codes[0x00]  # EOB
                w.write(code, ln)
    entropy = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    dqt = seg(0xFFDB, b"\x00" + bytes(QUANT_LUMA[ZIGZAG[i]] for i in range(64)))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1)
              + bytes([1, 0x11, 0]))
    dht_dc = seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    dht_ac = seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(0xFFDA, b"\x01" + bytes([1, 0x00]) + bytes([0, 63, 0]))
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
            + entropy + b"\xff\xd9")


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, row-major 8-bit pixels). Tables and dimensions
    come from the stream, not from assumptions. ValueError outside the
    baseline-grayscale subset, including truncation."""
    try:
        return _decode(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"JPEG: truncated or malformed payload: {e}") from e


def _decode(data: bytes) -> tuple[int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise ValueError("JPEG: missing SOI")
    pos = 2
    quant: list[int] | None = None
    width = height = None
    dc_tbl = ac_tbl = None
    entropy_start = None
    while pos + 4 <= len(data):
        (marker, length) = struct.unpack_from(">HH", data, pos)
        if marker == 0xFFD8 or (marker >> 8) != 0xFF:
            raise ValueError("JPEG: bad marker stream")
        body = data[pos + 4:pos + 2 + length]
        if marker == 0xFFDB:
            if body[0] & 0x0F or body[0] >> 4:
                raise ValueError("JPEG: only 8-bit table 0 supported")
            zz = list(body[1:65])
            quant = [0] * 64
            for i in range(64):
                quant[ZIGZAG[i]] = zz[i]
        elif marker == 0xFFC0:
            prec, height, width, ncomp = struct.unpack_from(">BHHB", body)
            if prec != 8 or ncomp != 1:
                raise ValueError("JPEG: only 8-bit single-component SOF0")
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("JPEG: only baseline SOF0 supported")
        elif marker == 0xFFC4:
            cls, tid = body[0] >> 4, body[0] & 0x0F
            bits = list(body[1:17])
            vals = list(body[17:17 + sum(bits)])
            if tid != 0:
                raise ValueError("JPEG: only table id 0 supported")
            if cls == 0:
                dc_tbl = _decode_table(bits, vals)
            else:
                ac_tbl = _decode_table(bits, vals)
        elif marker == 0xFFDD:
            raise ValueError("JPEG: restart intervals unsupported")
        elif marker == 0xFFDA:
            entropy_start = pos + 2 + length
            break
        pos += 2 + length
    if None in (quant, width, dc_tbl, ac_tbl, entropy_start):
        raise ValueError("JPEG: missing DQT/SOF0/DHT/SOS")
    end = data.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("JPEG: missing EOI")
    r = _BitReaderMSB(data[entropy_start:end])

    def read_code(tbl: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.bit()
            if (code, length) in tbl:
                return tbl[(code, length)]
        raise ValueError("JPEG: invalid Huffman code")

    def extend(v: int, cat: int) -> int:
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    bw = (width + 7) // 8
    bh = (height + 7) // 8
    img = bytearray(width * height)
    prev_dc = 0
    for by in range(bh):
        for bx in range(bw):
            q = [0] * 64
            cat = read_code(dc_tbl)
            diff = extend(r.bits(cat), cat) if cat else 0
            prev_dc += diff
            q[0] = prev_dc
            i = 1
            while i < 64:
                sym = read_code(ac_tbl)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, cat = sym >> 4, sym & 0x0F
                i += run
                if i > 63:
                    raise ValueError("JPEG: AC run past block end")
                q[i] = extend(r.bits(cat), cat)
                i += 1
            coef = [0.0] * 64
            for i in range(64):
                coef[ZIGZAG[i]] = q[i] * quant[ZIGZAG[i]]
            block = _idct(coef)
            for y in range(8):
                sy = by * 8 + y
                if sy >= height:
                    break
                for x in range(8):
                    sx = bx * 8 + x
                    if sx < width:
                        img[sy * width + sx] = block[y * 8 + x]
    return width, height, bytes(img)
