"""Minimal pure-stdlib GIF87a codec — a REAL compressed codec
(variable-width LZW) with no imaging libs.

PNG (core/png.py) demonstrated container+filter decode, but its
compression is zlib's — stdlib does the inflate. GIF's LZW is
implemented HERE, bit-level: variable code width (min+1 → 12 bits,
LSB-first packing), CLEAR/EOI control codes, dictionary growth and the
cScSc corner case. That retires the claim that every compressed codec
sits behind the stub seam: JPEG/MP3/H.264 still do (they need
DCT/entropy implementations that genuinely belong to a library), but
LZW-compressed images decode for real, oracle-checked through the
Spark plan like the other codecs.

Supported: GIF87a, one image, global color table only, non-interlaced.
Anything else raises ValueError and falls to the disclosed stub seam
in operators/multimodal.py.
"""

from __future__ import annotations

import struct

_MAX_CODE_WIDTH = 12


def _bits_needed(n: int) -> int:
    b = 0
    while (1 << b) < n:
        b += 1
    return b


class _BitWriter:
    """LSB-first bit packer (GIF's LZW byte order)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, width: int) -> int:
        while self.nbits < width:
            if self.pos >= len(self.data):
                raise ValueError("GIF: LZW stream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        code = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.nbits -= width
        return code


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    w = _BitWriter()
    w.write(clear, width)
    cur = b""
    for byte in indices:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        w.write(table[cur], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
            next_code += 1
        else:  # dictionary full: reset (rare at our sizes, still correct)
            w.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([byte])
    if cur:
        w.write(table[cur], width)
    w.write(eoi, width)
    return w.flush()


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _BitReader(data)
    out = bytearray()

    def fresh() -> list[bytes]:
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = r.read(width)
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the cScSc case
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("GIF: more pixels than descriptor promises")
    if len(out) != expected:
        raise ValueError(f"GIF: decoded {len(out)} pixels, wanted {expected}")
    return bytes(out)


def encode_gif(width: int, height: int, indices: bytes,
               palette: bytes) -> bytes:
    """GIF87a with a global color table. ``indices``: row-major palette
    indices (len == width*height); ``palette``: RGB bytes, length
    3 * 2^k for k in 1..8; every index must be < 2^k."""
    n_colors = len(palette) // 3
    k = _bits_needed(n_colors)
    if len(palette) != 3 * (1 << k) or not 1 <= k <= 8:
        raise ValueError("GIF: palette must be 3*2^k bytes, k in 1..8")
    if len(indices) != width * height:
        raise ValueError("GIF: index buffer != width*height")
    if indices and max(indices) >= n_colors:
        raise ValueError("GIF: index out of palette range")
    min_code_size = max(2, k)
    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | (k - 1))  # global table flag + size bits
    out += b"\x00\x00"  # background index, aspect
    out += palette
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out.append(min_code_size)
    lzw = _lzw_encode(indices, min_code_size)
    for i in range(0, len(lzw), 255):
        block = lzw[i:i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes, bytes]:
    """→ (width, height, palette_rgb, indices). Raises ValueError on
    anything outside the supported GIF87a subset, including truncated
    payloads (hostile-input discipline: never an IndexError)."""
    try:
        return _decode_gif(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"GIF: truncated or malformed payload: {e}") from e


def _decode_gif(data: bytes) -> tuple[int, int, bytes, bytes]:
    if data[:6] != b"GIF87a":
        raise ValueError("GIF: not GIF87a")
    width, height = struct.unpack_from("<HH", data, 6)
    packed = data[10]
    if not packed & 0x80:
        raise ValueError("GIF: no global color table")
    k = (packed & 0x07) + 1
    pos = 13
    palette = data[pos:pos + 3 * (1 << k)]
    pos += 3 * (1 << k)
    if data[pos] != 0x2C:
        raise ValueError("GIF: expected image descriptor")
    left, top, iw, ih = struct.unpack_from("<HHHH", data, pos + 1)
    if (left, top) != (0, 0) or (iw, ih) != (width, height):
        raise ValueError("GIF: sub-rectangle images unsupported")
    ipacked = data[pos + 9]
    if ipacked & 0xC0:
        raise ValueError("GIF: local table / interlace unsupported")
    pos += 10
    min_code_size = data[pos]
    pos += 1
    lzw = bytearray()
    while True:
        blen = data[pos]
        pos += 1
        if blen == 0:
            break
        lzw += data[pos:pos + blen]
        pos += blen
    indices = _lzw_decode(bytes(lzw), min_code_size, width * height)
    return width, height, palette, indices
