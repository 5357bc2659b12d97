"""Optimization-equivalence tests for the codec fast paths (r6).

Three invariants the r6 optimizations must preserve bit-for-bit:

* ``encode_image_with_decoded`` returns exactly ``(encode_image(a, fmt),
  decode_image(those bytes))`` for every format;
* the native (C) entropy-scan decode equals the pure-Python symbol loop;
* the ``bytes.find`` marker scan finds the same entropy segment as the
  old byte-walk (covered implicitly by the round-trips here since every
  stream ends in EOI).
"""

from __future__ import annotations

import numpy as np
import pytest

from data_model_spark.codecs import (
    decode_image,
    encode_image,
    encode_image_with_decoded,
)
from data_model_spark.codecs import _native
from data_model_spark.sources import images as img_src


@pytest.mark.parametrize("i", list(range(0, 48, 5)) + [1, 2, 4, 7, 11])
def test_encode_with_decoded_matches_decode(i):
    iid = img_src.revision_id(i, None)
    w, h = img_src.image_dims(i)
    fmt = img_src.image_fmt(i)
    px = img_src.synth_pixels(iid, w, h)
    data_ref = encode_image(px, fmt)
    data, dec = encode_image_with_decoded(px, fmt)
    assert data == data_ref
    assert np.array_equal(dec, decode_image(data_ref, fmt, w, h))


@pytest.mark.skipif(_native.decode_scan is None, reason="no C compiler")
@pytest.mark.parametrize("dims", [(64, 64), (256, 64), (512, 512), (63, 61)])
def test_native_scan_decode_equals_python(dims):
    w, h = dims
    rng = np.random.default_rng(1234 + w * h)
    px = (rng.integers(0, 4000, size=(h, w)) + 500).astype(np.uint16)
    data = encode_image(px, "jpeg")
    d_native = decode_image(data, "jpeg", w, h)
    saved = _native.decode_scan
    _native.decode_scan = None
    try:
        d_py = decode_image(data, "jpeg", w, h)
    finally:
        _native.decode_scan = saved
    assert np.array_equal(d_native, d_py)


def test_native_falls_back_on_garbage():
    # malformed streams must raise the same errors as before (fallback path)
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02", "jpeg", 2, 2)
