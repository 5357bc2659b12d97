"""Pure NumPy + zlib PNG codec (grayscale 8/16-bit).

No imaging library (PIL, imageio) is available in this container, so the
engine ships a real, lossless PNG implementation written from the public PNG
specification (RFC 2083 / W3C PNG): IHDR/IDAT/IEND chunks, zlib-deflated
scanlines.  The encoder emits filter type 0; the decoder implements all five
filter types (None/Sub/Up/Average/Paeth) so externally-produced grayscale
PNGs also decode.  Used inside Arrow-batched pandas UDFs — one call per
image, all pixel work vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a 2-D uint8/uint16 array as grayscale PNG (filter 0, zlib-6)."""
    a = np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("encode_png expects a 2-D grayscale array")
    if a.dtype == np.uint8:
        depth, payload = 8, a
    elif a.dtype == np.uint16:
        depth, payload = 16, a.astype(">u2")
    else:
        raise ValueError(f"unsupported dtype {a.dtype}; use uint8 or uint16")
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)  # color type 0 = gray
    raw = payload.tobytes()
    row_bytes = w * (depth // 8)
    # prepend filter byte 0 to each scanline without a Python-per-row loop
    mat = np.frombuffer(raw, dtype=np.uint8).reshape(h, row_bytes)
    filtered = np.concatenate([np.zeros((h, 1), np.uint8), mat], axis=1).tobytes()
    idat = zlib.compress(filtered, 6)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a grayscale (color type 0) PNG into a 2-D uint8/uint16 array."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG byte stream")
    pos = 8
    width = height = depth = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if color != 0 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    "only non-interlaced grayscale PNG is supported "
                    f"(color={color}, interlace={interlace})"
                )
            if depth not in (8, 16):
                raise ValueError(f"unsupported bit depth {depth}")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = depth // 8
    stride = width * bpp
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        cur = rows[r, 1:].astype(np.int32)
        f = filters[r]
        if f == 0:
            pass
        elif f == 1:  # Sub: per-lane prefix sum mod 256 (vectorized — the
            # recurrence cur[i] = raw[i] + cur[i-bpp] mod 256 IS a cumsum)
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(cur[lane::bpp], dtype=np.int64) & 0xFF
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average (sequential left-dependency; int32 math)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential left-dependency; int32 math)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else np.int32(0)
                ul = prev[i - bpp] if i >= bpp else np.int32(0)
                cur[i] = (cur[i] + int(_paeth(left, prev[i], ul))) & 0xFF
        else:
            raise ValueError(f"bad filter type {f}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    if depth == 8:
        return out.reshape(height, width)
    return out.reshape(height, width * 2).view(">u2").astype(np.uint16).reshape(height, width)
