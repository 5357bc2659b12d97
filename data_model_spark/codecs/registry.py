"""Image codec registry: fmt string -> encode/decode kernels.

Formats (matching the ``fmt`` column of the input table, FIXTURES.md §1):

* ``raw-u16`` — big-endian uint16 pixels, lossless, no container.
* ``png``     — real grayscale PNG (``png.py``), lossless.
* ``jpeg``    — **DETERMINISTIC LOSSY STUB.**  A real JPEG codec needs an
  imaging library that is not installed in this container (no PIL/libjpeg).
  The Spark-side plumbing (binary column, schema, Arrow batching, PSNR gate)
  is real; the codec is a clearly-marked stand-in: uniform quantization
  (step 4) + zlib, which is deterministic and *lossy*, so it genuinely
  exercises the PSNR >= 40 dB acceptance gate from BASELINE.json
  ``input_hint``.  Swap in a real JPEG codec by replacing the two functions
  guarded by ``_FAKE_JPEG_MAGIC`` below.

All functions operate on whole images (NumPy in / bytes out) so they stay
vectorized inside ``mapInPandas`` / pandas UDFs — no per-row Python in the
pixel loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .png import decode_png, encode_png

_FAKE_JPEG_MAGIC = b"QJPG"  # deterministic lossy stand-in, NOT a real JPEG
_QUANT_STEP = 4


def _encode_fake_jpeg(arr: np.ndarray) -> bytes:
    """STUB (see module docstring): quantize uint16 by step 4 + zlib."""
    a = np.asarray(arr, dtype=np.uint16)
    h, w = a.shape
    q = (a // _QUANT_STEP).astype(">u2")
    return (
        _FAKE_JPEG_MAGIC
        + struct.pack(">IIH", w, h, _QUANT_STEP)
        + zlib.compress(q.tobytes(), 6)
    )


def _decode_fake_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != _FAKE_JPEG_MAGIC:
        raise NotImplementedError(
            "real JPEG decode requires an imaging library not present in this "
            "container; only the deterministic QJPG stand-in is supported"
        )
    w, h, step = struct.unpack(">IIH", data[4:14])
    q = np.frombuffer(zlib.decompress(data[14:]), dtype=">u2").reshape(h, w)
    # dequantize to bin centers (step//2) for minimal expected error
    return np.minimum(
        q.astype(np.uint32) * step + step // 2, np.uint32(65535)
    ).astype(np.uint16)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    a = np.asarray(arr)
    if fmt == "raw-u16":
        return a.astype(">u2").tobytes()
    if fmt == "png":
        return encode_png(a.astype(np.uint16))
    if fmt == "jpeg":
        return _encode_fake_jpeg(a)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode image bytes to a (h, w) uint16 array."""
    if fmt == "raw-u16":
        return np.frombuffer(data, dtype=">u2").reshape(h, w).astype(np.uint16)
    if fmt == "png":
        return decode_png(data).astype(np.uint16)
    if fmt == "jpeg":
        return _decode_fake_jpeg(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def is_lossless(fmt: str) -> bool:
    return fmt in ("raw-u16", "png")


def psnr_db(reference: np.ndarray, decoded: np.ndarray, peak: float = 65535.0) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    ref = np.asarray(reference, dtype=np.float64)
    dec = np.asarray(decoded, dtype=np.float64)
    mse = float(np.mean((ref - dec) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
