"""Minimal pure-stdlib PNG codec (zlib + struct, no imaging libs).

Closes the round-1/2 "multimodal decode is stubbed" gap for the PNG
case: the container has no PIL/libav, but PNG is just zlib-compressed
filtered scanlines, so a correct decoder is ~100 lines of stdlib.
Supported: 8-bit, non-interlaced, color types 0 (grayscale), 2 (RGB),
4 (gray+alpha), 6 (RGBA); ALL five scanline filters (None/Sub/Up/
Average/Paeth). Anything else (16-bit, palette, interlaced, other
codecs like JPEG) raises ValueError and stays behind the disclosed
stub seam in operators/multimodal.py.

The encoder exists so the Spark multimodal path can round-trip REAL
PNG bytes end-to-end (encode in one stage, decode + feature-extract in
another) with a DuckDB oracle on the pixel arithmetic — the decoder is
therefore oracle-checked, not just unit-tested.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2,
               filter_type: int = 0) -> bytes:
    """pixels: row-major channel-interleaved 8-bit bytes
    (len == width*height*channels). ``filter_type`` applies the same
    filter to every scanline (0..4) — exercised by the round-trip
    tests so the decoder's whole filter matrix is covered."""
    ch = _CHANNELS[color_type]
    if len(pixels) != width * height * ch:
        raise ValueError(f"pixel buffer {len(pixels)} != {width}x{height}x{ch}")
    stride = width * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        raw.append(filter_type)
        raw.extend(_filter_row(filter_type, row, prev, ch))
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _filter_row(ft: int, row: bytes, prev: bytes, ch: int) -> bytes:
    if ft == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ft == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unsupported filter {ft}")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, row-major interleaved 8-bit pixels).
    Raises ValueError on anything outside the supported profile,
    including truncated headers (never struct.error/IndexError)."""
    try:
        return _decode_png(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or malformed PNG: {e}") from e


def _decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated chunk")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("scanline length mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)]
        row = bytearray(stride)
        for i, x in enumerate(line):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x + a
            elif ft == 2:
                v = x + b
            elif ft == 3:
                v = x + (a + b) // 2
            elif ft == 4:
                v = x + _paeth(a, b, c)
            else:
                raise ValueError(f"bad filter byte {ft}")
            row[i] = v & 0xFF
        out[y * stride:(y + 1) * stride] = row
        prev = bytes(row)
    return width, height, ch, bytes(out)
