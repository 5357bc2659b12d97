"""RIFF/WAVE PCM codec: spec-level goldens + roundtrip + chunk walking."""

import struct

import numpy as np
import pytest

from data_model_spark.codecs.wav import decode_wav, encode_wav_pcm16


def test_header_layout_matches_spec():
    """Container bytes follow the published RIFF/WAVE layout exactly."""
    x = np.array([0, 16384, -16384, -32768], dtype=np.int16)
    b = encode_wav_pcm16(x, 8000)
    assert b[:4] == b"RIFF"
    (riff_size,) = struct.unpack("<I", b[4:8])
    assert riff_size == len(b) - 8
    assert b[8:12] == b"WAVE"
    assert b[12:16] == b"fmt "
    (fmt_size,) = struct.unpack("<I", b[16:20])
    assert fmt_size == 16
    audio_format, ch, rate, byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", b[20:36]
    )
    assert (audio_format, ch, rate, bits) == (1, 1, 8000, 16)
    assert byte_rate == rate * block_align == 8000 * 2
    assert b[36:40] == b"data"
    (data_size,) = struct.unpack("<I", b[40:44])
    assert data_size == 8  # 4 samples * 2 bytes


def test_int16_roundtrip_bit_exact():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, size=1234, dtype=np.int16)
    got, rate = decode_wav(encode_wav_pcm16(x, 16000))
    assert rate == 16000
    np.testing.assert_array_equal(
        np.round(got[:, 0] * 32768.0).astype(np.int16), x
    )


def test_stereo_interleave_roundtrip():
    rng = np.random.default_rng(8)
    x = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    got, rate = decode_wav(encode_wav_pcm16(x, 44100, channels=2))
    assert got.shape == (500, 2)
    np.testing.assert_array_equal(
        np.round(got * 32768.0).astype(np.int16), x
    )


def test_extra_chunks_skipped():
    """Decoders must walk the chunk list, not assume fixed offsets —
    a LIST/INFO chunk (odd-sized, to exercise word alignment) before
    'data' is legal WAVE."""
    x = np.array([100, -100, 3000], dtype=np.int16)
    b = encode_wav_pcm16(x, 8000)
    head, data_chunk = b[:36], b[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    patched = head + extra + data_chunk
    riff_size = len(patched) - 8
    patched = patched[:4] + struct.pack("<I", riff_size) + patched[8:]
    got, rate = decode_wav(patched)
    np.testing.assert_array_equal(
        np.round(got[:, 0] * 32768.0).astype(np.int16), x
    )


def test_8bit_unsigned_decode():
    """8-bit WAVE is unsigned with 128 bias per spec."""
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 3) + data + b"\x00"
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    got, _ = decode_wav(payload)
    np.testing.assert_allclose(got[:, 0], [-1.0, 0.0, 127 / 128.0])


def test_non_pcm_rejected():
    x = np.zeros(4, dtype=np.int16)
    b = bytearray(encode_wav_pcm16(x, 8000))
    b[20:22] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(b))


def test_truncated_rejected():
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_truncated_data_chunk_raises():
    import pytest
    import numpy as np
    from data_model_spark.codecs import wav

    good = wav.encode_wav_pcm16(np.zeros(64, dtype=np.int16), 8000)
    with pytest.raises(ValueError, match="truncated"):
        wav.decode_wav(good[:-10])


def test_short_fmt_chunk_raises():
    import struct
    import pytest
    from data_model_spark.codecs import wav

    fmt = struct.pack("<HH", 1, 1)  # only 4 of 16 required bytes
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="fmt chunk too short"):
        wav.decode_wav(payload)
