"""Baseline JFIF codec (ITU-T T.81, written from the spec — no libjpeg).

Checks stream structure against the standard's marker layout, roundtrip
accuracy across shapes/qualities, the 16-bit affine (APP4) path behind the
registry, and the PSNR>=40dB gate from BASELINE.json input_hint.
"""

import struct

import numpy as np
import pytest

from data_model_spark.codecs import jpeg as J
from data_model_spark.codecs.registry import decode_image, encode_image, psnr_db
from data_model_spark.sources.images import synth_pixels


def smooth_noise(shape, seed=7, sigma=12.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0 : shape[0], 0 : shape[1]]
    a = 128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 11.0) + rng.normal(0, sigma, shape)
    return np.clip(a, 0, 255).astype(np.uint8)


class TestStream:
    def test_marker_layout(self):
        enc = J.encode_jpeg_gray8(smooth_noise((32, 32)))
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        assert enc[2:4] == b"\xff\xe0" and enc[6:11] == b"JFIF\x00"
        # SOF0 present with 8-bit precision, 1 component; DQT, 2 DHTs, SOS
        for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
            assert marker in enc

    def test_sof0_dimensions(self):
        enc = J.encode_jpeg_gray8(smooth_noise((40, 56)))
        i = enc.index(b"\xff\xc0")
        _, prec, h, w, nc = struct.unpack(">HBHHB", enc[i + 2 : i + 10])
        assert (prec, h, w, nc) == (8, 40, 56, 1)

    def test_no_bare_ff_in_scan(self):
        """Byte stuffing: between SOS payload start and EOI, every 0xFF must
        be followed by 0x00 (no accidental markers)."""
        enc = J.encode_jpeg_gray8(smooth_noise((64, 64)))
        i = enc.index(b"\xff\xda")
        ln = struct.unpack(">H", enc[i + 2 : i + 4])[0]
        scan = enc[i + 2 + ln : -2]
        j = 0
        while j < len(scan) - 1:
            if scan[j] == 0xFF:
                assert scan[j + 1] == 0x00, f"bare FF at {j}"
                j += 2
            else:
                j += 1


class TestRoundtrip:
    @pytest.mark.parametrize(
        "shape", [(8, 8), (64, 64), (57, 71), (1, 1), (3, 20), (128, 96)]
    )
    def test_shapes(self, shape):
        img = smooth_noise(shape)
        dec = J.decode_jpeg_gray8(J.encode_jpeg_gray8(img, 95))
        assert dec.shape == img.shape
        rmse = float(np.sqrt(np.mean((dec.astype(float) - img.astype(float)) ** 2)))
        assert rmse < 3.5

    def test_quality_monotonic(self):
        img = smooth_noise((96, 96))
        sizes, errs = [], []
        for q in (25, 50, 75, 95):
            e = J.encode_jpeg_gray8(img, q)
            d = J.decode_jpeg_gray8(e)
            sizes.append(len(e))
            errs.append(float(np.mean((d.astype(float) - img) ** 2)))
        assert sizes == sorted(sizes)
        assert errs == sorted(errs, reverse=True)

    def test_pure_noise_roundtrips(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (48, 48)).astype(np.uint8)
        d = J.decode_jpeg_gray8(J.encode_jpeg_gray8(img, 95))
        assert d.shape == img.shape

    def test_constant_block_exact_dc(self):
        img = np.full((16, 16), 200, dtype=np.uint8)
        d = J.decode_jpeg_gray8(J.encode_jpeg_gray8(img, 95))
        np.testing.assert_array_equal(d, img)

    def test_deterministic(self):
        img = smooth_noise((64, 64))
        assert J.encode_jpeg_gray8(img, 95) == J.encode_jpeg_gray8(img, 95)


class TestRegistryU16:
    def test_psnr_gate_on_synth_pixels(self):
        """input_hint invariant: decoded pixels PSNR >= 40 dB for lossy fmt."""
        for dim in (64, 256):
            px = synth_pixels(f"img_{dim:012d}", dim, dim)
            enc = encode_image(px, "jpeg")
            assert enc[:2] == b"\xff\xd8"  # a REAL jpeg, not the stand-in
            dec = decode_image(enc, "jpeg", dim, dim)
            assert psnr_db(px, dec) >= 40.0

    def test_app4_rescale_roundtrip(self):
        a = (np.arange(64 * 64, dtype=np.uint16).reshape(64, 64) * 7) % 60000
        dec = decode_image(encode_image(a, "jpeg"), "jpeg", 64, 64)
        assert psnr_db(a, dec) >= 40.0

    def test_legacy_qjpg_still_decodes(self):
        import struct as st
        import zlib

        a = synth_pixels("img_legacy", 32, 32)
        legacy = (
            b"QJPG"
            + st.pack(">IIH", 32, 32, 4)
            + zlib.compress((a // 4).astype(">u2").tobytes(), 6)
        )
        d = decode_image(legacy, "jpeg", 32, 32)
        assert psnr_db(a, d) >= 40.0


class TestDecoderBoundaries:
    """Honest-boundary behavior: mis-decodable streams refuse, legal padding
    is accepted (T.81 B.1.1.2 allows 0xFF fill bytes before any marker)."""

    def test_dri_rejected_not_misdecoded(self):
        enc = bytearray(J.encode_jpeg_gray8(smooth_noise((16, 16))))
        # splice a DRI segment (FF DD 00 04 + 2-byte interval) after SOI
        dri = bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 0x08])
        spliced = bytes(enc[:2]) + dri + bytes(enc[2:])
        with pytest.raises(NotImplementedError, match="restart"):
            J.decode_jpeg_gray8(spliced)

    def test_fill_bytes_before_marker_accepted(self):
        px = smooth_noise((16, 16))
        enc = bytearray(J.encode_jpeg_gray8(px))
        spliced = bytes(enc[:2]) + b"\xff\xff\xff" + bytes(enc[2:])
        out = J.decode_jpeg_gray8(spliced)
        np.testing.assert_array_equal(out, J.decode_jpeg_gray8(bytes(enc)))

    def test_declared_scan_tables_respected(self):
        """A foreign-encoder stream may declare Huffman table 1 in DHT+SOS
        (T.81: Td/Ta live in SOS byte 2, not byte 3=Ss).  Rewriting our
        stream's table ids 0 -> 1 must decode identically."""
        px = smooth_noise((24, 24))
        enc = bytearray(J.encode_jpeg_gray8(px))
        i = 2
        while i < len(enc) - 1:
            assert enc[i] == 0xFF
            marker = enc[i + 1]
            i += 2
            if marker == 0xD9:
                break
            ln = struct.unpack(">H", bytes(enc[i : i + 2]))[0]
            if marker == 0xC4:  # DHT: set table id -> 1 (keep class nibble)
                p = i + 2
                while p < i + ln:
                    enc[p] = (enc[p] & 0xF0) | 0x01
                    nv = sum(enc[p + 1 : p + 17])
                    p += 17 + nv
            elif marker == 0xDA:  # SOS: Td/Ta byte is seg[2] -> 0x11
                enc[i + 2 + 2] = 0x11
                break
            i += ln
        out = J.decode_jpeg_gray8(bytes(enc))
        np.testing.assert_array_equal(out, J.decode_jpeg_gray8(J.encode_jpeg_gray8(px)))
