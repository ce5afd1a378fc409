"""Minimal pure-stdlib WAV (RIFF PCM) codec — the audio sibling of
core/png.py. Supports 16-bit signed little-endian PCM, any channel
count / sample rate, standard RIFF chunk walking (extra chunks like
LIST/fact are skipped). Compressed formats (MP3/AAC/…) stay behind the
disclosed stub seam in operators/multimodal.py.
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """samples: interleaved signed 16-bit ints (len divisible by
    channels)."""
    if len(samples) % channels:
        raise ValueError("sample count not divisible by channel count")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """→ (sample_rate, channels, interleaved signed 16-bit samples).
    ValueError on anything outside the 16-bit-PCM profile."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = channels = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        chunk = payload[pos + 8:pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            fmt_code, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if fmt_code != 1 or bits != 16:
                raise ValueError(f"unsupported format (code={fmt_code}, bits={bits})")
        elif tag == b"data":
            data = chunk
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM byte count")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    return sample_rate, channels, samples
