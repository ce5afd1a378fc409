"""Minimal pure-stdlib Y4M (YUV4MPEG2) video codec — the video sibling
of core/png.py and core/wav.py. Y4M is the uncompressed interchange
format ffmpeg/x264 consume: an ASCII stream header
(``YUV4MPEG2 W<w> H<h> F<num>:<den> ...``) followed by ``FRAME`` markers
and raw planar YUV bytes. Supported here: C420 (default, 4:2:0) and
C444 chroma; anything compressed (H.264/VP9/…) stays behind the
disclosed stub seam in operators/multimodal.py.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"


def _frame_size(w: int, h: int, chroma: str) -> int:
    if chroma.startswith("420"):
        return w * h + 2 * ((w // 2) * (h // 2))
    if chroma == "444":
        return 3 * w * h
    raise ValueError(f"unsupported chroma subsampling C{chroma}")


def encode_y4m(width: int, height: int, frames: list[bytes],
               fps: tuple[int, int] = (25, 1), chroma: str = "420") -> bytes:
    """frames: planar YUV bytes per frame (Y then U then V planes)."""
    fsz = _frame_size(width, height, chroma)
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 C{chroma}\n"
    ).encode()
    out = bytearray(header)
    for fr in frames:
        if len(fr) != fsz:
            raise ValueError(f"frame size {len(fr)} != expected {fsz}")
        out += b"FRAME\n" + fr
    return bytes(out)


def decode_y4m(payload: bytes) -> tuple[int, int, tuple[int, int], list[bytes]]:
    """→ (width, height, (fps_num, fps_den), frames as planar YUV
    bytes). ValueError outside the supported profile."""
    if not payload.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("unterminated stream header")
    width = height = None
    fps = (25, 1)
    chroma = "420"
    for tok in payload[len(_MAGIC) + 1:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:].decode("ascii", "replace")
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif key == b"C":
            chroma = val
        # Ip/A/X params are irrelevant to the pixel payload
    if width is None or height is None:
        raise ValueError("missing W/H in stream header")
    # hostile-input discipline (ADVICE r3): range-validate the header
    # like the sibling codecs — a 'F0:1'/negative-rate header must fail
    # HERE as ValueError, not later as ZeroDivisionError in the stats
    # operator; negative/zero W/H must not masquerade as truncation
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid frame dimensions {width}x{height}")
    if fps[0] <= 0 or fps[1] <= 0:
        raise ValueError(f"invalid frame rate {fps[0]}:{fps[1]}")
    fsz = _frame_size(width, height, chroma)
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("corrupt FRAME marker")
        fr = payload[fnl + 1:fnl + 1 + fsz]
        if len(fr) != fsz:
            raise ValueError("truncated frame payload")
        frames.append(fr)
        pos = fnl + 1 + fsz
    return width, height, fps, frames
