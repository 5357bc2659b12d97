"""Image codec registry: fmt string -> encode/decode kernels.

Formats (matching the ``fmt`` column of the input table, FIXTURES.md §1):

* ``raw-u16`` — big-endian uint16 pixels, lossless, no container.
* ``png``     — real grayscale PNG (``png.py``, from RFC 2083), lossless.
* ``jpeg``    — **real baseline JFIF** (``jpeg.py``, written from ITU-T
  T.81 — no PIL/libjpeg in this container).  16-bit samples ride through a
  per-image affine rescale to 8-bit whose (offset, scale) pair is carried
  in an APP4 segment — the CF scale/offset packing idea (SURVEY §2 F6) at
  the codec boundary; the pixel stream itself is standard-decodable.
  Decode also accepts the legacy ``QJPG`` stand-in (uniform quantization +
  zlib) used before the real codec existed.

All functions operate on whole images (NumPy in / bytes out) so they stay
vectorized inside ``mapInPandas`` / pandas UDFs — no per-row Python in the
pixel loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .jpeg import decode_jpeg_gray8, encode_jpeg_gray8, read_app4
from .png import decode_png, encode_png

_FAKE_JPEG_MAGIC = b"QJPG"  # legacy deterministic lossy stand-in
_QUANT_STEP = 4
_APP4_MAGIC = b"DMS1"
JPEG_QUALITY = 95


def _probe_external_jpeg():
    """(encode8, decode8, backend-name): prefer a libjpeg-backed library
    (Pillow) when importable — on a real cluster that slot is
    libjpeg-turbo, ~100x the pure-Python T.81 decoder — else fall back to
    the spec-written NumPy implementation (``jpeg.py``).  Both sides of the
    boundary speak standard baseline JFIF, so payloads are interchangeable
    across backends; only throughput differs."""
    try:
        import io

        from PIL import Image  # noqa: F401  (absent in this container)

        def enc8(a: np.ndarray, quality: int = JPEG_QUALITY, extra_app: bytes = b"") -> bytes:
            buf = io.BytesIO()
            Image.fromarray(np.asarray(a, dtype=np.uint8), mode="L").save(
                buf, "JPEG", quality=quality
            )
            b = buf.getvalue()
            if extra_app:
                # splice our APP4 metadata segment right after SOI
                seg = b"\xff\xe4" + struct.pack(">H", len(extra_app) + 2) + extra_app
                b = b[:2] + seg + b[2:]
            return b

        def dec8(data: bytes) -> np.ndarray:
            return np.asarray(Image.open(io.BytesIO(data)).convert("L"))

        # a successful import is NOT enough: a Pillow built without
        # libjpeg imports fine and fails at first encode ("encoder jpeg
        # not available") inside an executor UDF.  Round-trip one 8x8
        # block at probe time so a JPEG-less Pillow falls back cleanly.
        probe = np.arange(64, dtype=np.uint8).reshape(8, 8)
        if dec8(enc8(probe)).shape != (8, 8):
            raise ImportError("pillow jpeg round-trip failed")

        return enc8, dec8, "pillow"
    except Exception:
        return encode_jpeg_gray8, decode_jpeg_gray8, "pure-numpy-t81"


JPEG8_ENCODE, JPEG8_DECODE, JPEG_BACKEND = _probe_external_jpeg()


def _encode_jpeg_u16(arr: np.ndarray) -> bytes:
    """Real baseline JFIF of the affine-rescaled 16-bit image; (offset,
    scale) stored in APP4 so decode restores the radiometric range."""
    a = np.asarray(arr, dtype=np.uint16)
    lo = float(a.min()) if a.size else 0.0
    hi = float(a.max()) if a.size else 0.0
    scale = max((hi - lo) / 255.0, 1.0 / 255.0)
    e8 = np.clip(np.round((a.astype(np.float64) - lo) / scale), 0, 255).astype(
        np.uint8
    )
    app4 = _APP4_MAGIC + struct.pack(">dd", lo, scale)
    return JPEG8_ENCODE(e8, quality=JPEG_QUALITY, extra_app=app4)


def _decode_jpeg_u16(data: bytes) -> np.ndarray:
    if data[:4] == _FAKE_JPEG_MAGIC:  # legacy QJPG stand-in
        w, h, step = struct.unpack(">IIH", data[4:14])
        q = np.frombuffer(zlib.decompress(data[14:]), dtype=">u2").reshape(h, w)
        return np.minimum(
            q.astype(np.uint32) * step + step // 2, np.uint32(65535)
        ).astype(np.uint16)
    lo, scale = 0.0, 1.0
    app4 = read_app4(data)
    if app4 is not None and app4[:4] == _APP4_MAGIC:
        lo, scale = struct.unpack(">dd", app4[4:20])
    e8 = JPEG8_DECODE(data)
    return np.clip(
        np.round(e8.astype(np.float64) * scale + lo), 0, 65535
    ).astype(np.uint16)


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    a = np.asarray(arr)
    if fmt == "raw-u16":
        return a.astype(">u2").tobytes()
    if fmt == "png":
        return encode_png(a.astype(np.uint16))
    if fmt == "jpeg":
        return _encode_jpeg_u16(a)
    raise ValueError(f"unknown fmt {fmt!r}")


def encode_image_with_decoded(arr: np.ndarray, fmt: str) -> tuple[bytes, np.ndarray]:
    """``(encode_image(arr, fmt), decode_image(those bytes))`` without the
    decode pass: lossless formats return the input pixels; JPEG reuses the
    encoder's own quantized coefficients (``encode_jpeg_gray8``'s
    ``return_decoded`` — bit-identical, entropy coding is lossless).  Used
    by generators that need both the stream and its decoded ground truth
    (e.g. phash of the lossy pixels)."""
    a = np.asarray(arr, dtype=np.uint16)
    if fmt in ("raw-u16", "png"):
        return encode_image(a, fmt), a
    if fmt == "jpeg":
        if JPEG_BACKEND != "pure-numpy-t81":
            data = _encode_jpeg_u16(a)
            return data, _decode_jpeg_u16(data)
        lo = float(a.min()) if a.size else 0.0
        hi = float(a.max()) if a.size else 0.0
        scale = max((hi - lo) / 255.0, 1.0 / 255.0)
        e8 = np.clip(np.round((a.astype(np.float64) - lo) / scale), 0, 255).astype(
            np.uint8
        )
        app4 = _APP4_MAGIC + struct.pack(">dd", lo, scale)
        data, dec8 = encode_jpeg_gray8(
            e8, quality=JPEG_QUALITY, extra_app=app4, return_decoded=True
        )
        dec16 = np.clip(
            np.round(dec8.astype(np.float64) * scale + lo), 0, 65535
        ).astype(np.uint16)
        return data, dec16
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode image bytes to a (h, w) uint16 array."""
    if fmt == "raw-u16":
        return np.frombuffer(data, dtype=">u2").reshape(h, w).astype(np.uint16)
    if fmt == "png":
        return decode_png(data).astype(np.uint16)
    if fmt == "jpeg":
        return _decode_jpeg_u16(data)
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
