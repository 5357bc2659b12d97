"""Brovey: ratio-identity goldens + integer rounding exactness."""

import numpy as np

from data_model_spark.operators.pansharpen import BANDS, brovey


def test_equal_bands_pass_through_sharp():
    # when b = g = r, out_i = b_i * s * 3 / (3 b) = s exactly
    b = np.full((8, 8), 700, np.uint16)
    s = np.full((8, 8), 1234, np.uint16)
    out = brovey({n: b for n in BANDS}, s)
    for v in out.values():
        assert (v == 1234).all()


def test_zero_denominator_is_nodata():
    z = np.zeros((4, 4), np.uint16)
    s = np.full((4, 4), 999, np.uint16)
    out = brovey({n: z for n in BANDS}, s)
    for v in out.values():
        assert (v == 0).all()


def test_half_up_rounding():
    # b02 = 1, b03 = 1, b04 = 0, s = 1: out_b02 = 3/(2+0... den=2 ->
    # 1*1*3/2 = 1.5 -> HALF-UP 2
    bands = {
        "b02": np.array([[1]], np.uint16),
        "b03": np.array([[1]], np.uint16),
        "b04": np.array([[0]], np.uint16),
    }
    s = np.array([[1]], np.uint16)
    out = brovey(bands, s)
    assert out["b02"][0, 0] == 2  # 1.5 rounds up
    assert out["b04"][0, 0] == 0


def test_matches_float_reference():
    rng = np.random.default_rng(17)
    bands = {n: rng.integers(0, 5000, (32, 32)).astype(np.uint16) for n in BANDS}
    s = rng.integers(0, 5000, (32, 32)).astype(np.uint16)
    out = brovey(bands, s)
    den = sum(b.astype(np.float64) for b in bands.values())
    for n in BANDS:
        ref = np.where(
            den > 0,
            np.floor(
                bands[n].astype(np.float64) * s.astype(np.float64) * 3 / np.maximum(den, 1)
                + 0.5
            ),
            0,
        )
        assert (out[n] == np.minimum(ref, 65535)).all()
