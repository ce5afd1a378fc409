"""Minimal pure-stdlib AVI + Microsoft RLE8 video codec.

The video sibling of core/gif.py: Y4M (core/y4m.py) proved container
parsing on uncompressed frames; this module decodes a genuinely
COMPRESSED video stream — BI_RLE8 (biCompression=1), the classic
run-length video codec — inside a real RIFF/AVI container (avih/strh/
strf headers, BGR0 palette, '00dc' frame chunks). With GIF/LZW for
images and G.711 µ-law for audio, all three modalities now decode a
real compressed format in-sandbox; the perceptual codecs (H.264/VP9,
JPEG, MP3) remain behind the disclosed stub seam.

Supported: one 'vids' stream, 8-bit palettized, BI_RLE8 with encoded
runs, absolute runs, EOL and EOF escapes (the delta/skip escape 0x02
raises — our encoder never emits it, and accepting it silently would
turn truncated frames into garbage pixels instead of an error). BMP
row order (bottom-up) is handled inside decode; callers see top-down
row-major indices. Anything else raises ValueError.
"""

from __future__ import annotations

import struct


def _rle8_encode_frame(width: int, height: int, indices: bytes) -> bytes:
    """Top-down row-major palette indices → BI_RLE8 stream (rows
    emitted bottom-up per BMP convention; encoded runs only)."""
    out = bytearray()
    for y in range(height - 1, -1, -1):
        row = indices[y * width:(y + 1) * width]
        x = 0
        while x < len(row):
            run = 1
            while (x + run < len(row) and row[x + run] == row[x]
                   and run < 255):
                run += 1
            out += bytes([run, row[x]])
            x += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def _rle8_decode_frame(width: int, height: int, data: bytes) -> bytes:
    """BI_RLE8 stream → top-down row-major indices. Handles encoded
    runs, absolute runs (word-aligned), EOL, EOF; the delta escape is
    rejected (see module docstring)."""
    rows = [bytearray() for _ in range(height)]
    y = height - 1  # BMP rows are stored bottom-up
    pos = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("RLE8: stream ended without EOF marker")
        a, b = data[pos], data[pos + 1]
        pos += 2
        if a > 0:  # encoded run
            if y < 0:
                raise ValueError("RLE8: pixel data after last row")
            rows[y] += bytes([b]) * a
        elif b == 0:  # end of line
            if y < 0:
                raise ValueError("RLE8: EOL after last row")
            if len(rows[y]) != width:
                raise ValueError(
                    f"RLE8: row {y} has {len(rows[y])} pixels, wanted {width}"
                )
            y -= 1
        elif b == 1:  # end of bitmap
            break
        elif b == 2:
            raise ValueError("RLE8: delta/skip escape unsupported")
        else:  # absolute run of b pixels, word-aligned
            if y < 0:
                raise ValueError("RLE8: pixel data after last row")
            end = pos + b
            if end > len(data):
                raise ValueError("RLE8: truncated absolute run")
            rows[y] += data[pos:end]
            pos = end + (b & 1)
    if y != -1:
        raise ValueError(f"RLE8: EOF with {y + 1} rows missing")
    return b"".join(rows)


def encode_avi_rle8(width: int, height: int, frames: list[bytes],
                    palette: bytes, fps: int = 10) -> bytes:
    """frames: top-down row-major palette indices per frame; palette:
    RGB triples (length 3·n_colors, n_colors ≤ 256)."""
    n_colors = len(palette) // 3
    if len(palette) != 3 * n_colors or not 1 <= n_colors <= 256:
        raise ValueError("AVI: palette must be 3*n bytes, n in 1..256")
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError("AVI: frame size != width*height")
        if fr and max(fr) >= n_colors:
            raise ValueError("AVI: index out of palette range")

    payloads = [_rle8_encode_frame(width, height, fr) for fr in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"mrle"
        + struct.pack("<IHHIIIIIIIi4H", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0xFFFFFFFF & -1, 0, 0, 0, 0, 0)
    )
    bmih = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 1,
                       len(payloads[0]) if payloads else 0, 0, 0,
                       n_colors, 0)
    pal_bgr0 = b"".join(
        bytes([palette[3 * j + 2], palette[3 * j + 1], palette[3 * j], 0])
        for j in range(n_colors)
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bmih + pal_bgr0)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_rle8(data: bytes) -> tuple[int, int, bytes, list[bytes]]:
    """→ (width, height, palette_rgb, frames as top-down row-major
    indices). ValueError outside the supported subset, including
    truncation (never IndexError)."""
    try:
        return _decode(data)
    except (IndexError, struct.error) as e:
        raise ValueError(f"AVI: truncated or malformed payload: {e}") from e


def _decode(data: bytes) -> tuple[int, int, bytes, list[bytes]]:
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("AVI: not a RIFF/AVI stream")
    width = height = None
    palette = None
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        nonlocal width, height, palette
        pos = start
        while pos + 8 <= end:
            tag = data[pos:pos + 4]
            (length,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = body_start + length
            if body_end > end:
                raise ValueError("AVI: chunk overruns its parent")
            if tag == b"LIST":
                walk(body_start + 4, body_end)
            elif tag == b"strf":
                (size, w, h, _pl, bpp, comp, _szi, _xp, _yp, used,
                 _imp) = struct.unpack_from("<IiiHHIIiiII", data, body_start)
                if bpp != 8 or comp != 1:
                    raise ValueError(
                        f"AVI: unsupported stream (bpp={bpp}, comp={comp})"
                    )
                width, height = w, h
                n_colors = used or 256
                pal = data[body_start + size:body_start + size + 4 * n_colors]
                if len(pal) != 4 * n_colors:
                    raise ValueError("AVI: truncated palette")
                palette = b"".join(
                    bytes([pal[4 * j + 2], pal[4 * j + 1], pal[4 * j]])
                    for j in range(n_colors)
                )
            elif tag == b"00dc":
                frames.append(data[body_start:body_end])
            pos = body_end + (length & 1)

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    if width is None or palette is None:
        raise ValueError("AVI: missing strf header")
    decoded = [_rle8_decode_frame(width, height, f) for f in frames]
    return width, height, palette, decoded
