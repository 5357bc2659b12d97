"""YUV4MPEG2 container: header goldens, roundtrip, chroma-plane advance."""

import numpy as np
import pytest

from data_model_spark.codecs.y4m import decode_y4m, encode_y4m_mono


def test_mono_roundtrip():
    rng = np.random.default_rng(5)
    stack = rng.integers(0, 256, size=(5, 24, 32), dtype=np.uint8)
    payload = encode_y4m_mono(stack, fps=(30, 1))
    frames, fps = decode_y4m(payload)
    assert fps == (30, 1)
    np.testing.assert_array_equal(frames, stack)


def test_header_is_spec_ascii():
    stack = np.zeros((1, 4, 6), dtype=np.uint8)
    payload = encode_y4m_mono(stack)
    head = payload.split(b"\n", 1)[0]
    assert head == b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 Cmono"
    assert payload.split(b"\n", 2)[1] == b"FRAME"


def test_c420_stream_decodes_luma():
    """Hand-built C420jpeg stream (default colourspace when C is absent):
    decode must return the luma plane and step over chroma correctly."""
    w, h = 8, 4
    y0 = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    y1 = (y0 + 100).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 128, dtype=np.uint8)
    payload = (
        f"YUV4MPEG2 W{w} H{h} F25:1\n".encode()
        + b"FRAME\n" + y0.tobytes() + cb.tobytes() + cb.tobytes()
        + b"FRAME\n" + y1.tobytes() + cb.tobytes() + cb.tobytes()
    )
    frames, _ = decode_y4m(payload)
    assert frames.shape == (2, h, w)
    np.testing.assert_array_equal(frames[0], y0)
    np.testing.assert_array_equal(frames[1], y1)


def test_frame_params_skipped():
    """FRAME headers may carry parameters (spec: 'FRAME <params>\\n')."""
    y = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = b"YUV4MPEG2 W4 H3 F25:1 Cmono\nFRAME Ip\n" + y.tobytes()
    frames, _ = decode_y4m(payload)
    np.testing.assert_array_equal(frames[0], y)


def test_bad_magic_and_truncation():
    with pytest.raises(ValueError):
        decode_y4m(b"NOTY4M W1 H1\n")
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W8 H8 Cmono\nFRAME\n\x00\x00")
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C411\nFRAME\n\x00\x00\x00\x00")
