"""JPEG backend probe: prefer a libjpeg-backed library when importable.

Pillow is absent from this container, so the library path is exercised with
a minimal FAKE ``PIL`` whose encode/decode delegate to the pure T.81 codec
— this tests the PROBE AND WIRING (import preference, APP4 splicing,
fallback), not Pillow itself.
"""

import io
import sys
import types

import numpy as np

from data_model_spark.codecs import jpeg as pure_jpeg
from data_model_spark.codecs import registry


def _fake_pil():
    """A PIL lookalike backed by the pure codec."""
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    class _Img:
        def __init__(self, arr=None, data=None):
            self._arr, self._data = arr, data

        def save(self, buf, fmt, quality=75):
            assert fmt == "JPEG"
            buf.write(pure_jpeg.encode_jpeg_gray8(self._arr, quality=quality))

        def convert(self, mode):
            assert mode == "L"
            return self

        def __array__(self, dtype=None, copy=None):
            a = pure_jpeg.decode_jpeg_gray8(self._data)
            return a.astype(dtype) if dtype is not None else a

    def fromarray(arr, mode):
        assert mode == "L"
        return _Img(arr=np.asarray(arr))

    def open_(buf):
        return _Img(data=buf.read() if isinstance(buf, io.BytesIO) else buf)

    image_mod.fromarray = fromarray
    image_mod.open = open_
    pil.Image = image_mod
    return pil, image_mod


def test_fallback_without_library():
    """In this container PIL is absent: probe lands on the pure codec."""
    assert "PIL" not in sys.modules or sys.modules["PIL"] is None
    enc, dec, name = registry._probe_external_jpeg()
    assert name == "pure-numpy-t81"
    assert enc is pure_jpeg.encode_jpeg_gray8 and dec is pure_jpeg.decode_jpeg_gray8


def test_probe_prefers_library_and_splices_app4(monkeypatch):
    pil, image_mod = _fake_pil()
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    enc, dec, name = registry._probe_external_jpeg()
    assert name == "pillow"

    a = (np.arange(64 * 64) % 251).reshape(64, 64).astype(np.uint8)
    app4 = b"DMS1" + b"\x00" * 16
    payload = enc(a, quality=95, extra_app=app4)
    # spliced APP4 is discoverable by the standard segment walk
    assert pure_jpeg.read_app4(payload) == app4
    # and the stream still decodes (both through the fake lib and the pure
    # decoder — backends are interchangeable on the wire)
    np.testing.assert_array_equal(dec(payload), pure_jpeg.decode_jpeg_gray8(payload))


def test_u16_wrapper_uses_probed_backend(monkeypatch):
    """_encode/_decode_jpeg_u16 route through the module-level backend."""
    calls = []

    def spy_enc(a, quality=95, extra_app=b""):
        calls.append("enc")
        return pure_jpeg.encode_jpeg_gray8(a, quality=quality, extra_app=extra_app)

    def spy_dec(data):
        calls.append("dec")
        return pure_jpeg.decode_jpeg_gray8(data)

    monkeypatch.setattr(registry, "JPEG8_ENCODE", spy_enc)
    monkeypatch.setattr(registry, "JPEG8_DECODE", spy_dec)
    arr = np.linspace(500, 4000, 64 * 64).reshape(64, 64).astype(np.uint16)
    data = registry.encode_image(arr, "jpeg")
    out = registry.decode_image(data, "jpeg", 64, 64)
    assert calls == ["enc", "dec"]
    assert registry.psnr_db(arr, out) >= 40.0
