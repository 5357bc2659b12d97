"""JPEG quality recovery: marker walk, exact IJG inversion, keep-gate."""

import numpy as np

from data_model_spark.codecs.jpeg import ZIGZAG, encode_jpeg_gray8, quant_table
from data_model_spark.operators.jpeg_qa import (
    KEEP_Q,
    estimate_quality,
    jpeg_quality_rows,
    parse_dqt,
    true_quality,
)
from data_model_spark.sources.images import generate_images_df

IMG = (np.arange(48 * 32, dtype=np.uint8).reshape(48, 32) * 7 % 251).astype(
    np.uint8
)


def test_parse_dqt_round_trips_encoder_table():
    for q in (10, 35, 50, 75, 95, 100):
        data = encode_jpeg_gray8(IMG, quality=q)
        assert np.array_equal(parse_dqt(data), quant_table(q))


def test_estimate_quality_exact_inverse_over_full_range():
    # every quality maps back to ITSELF or to a smaller q with the
    # identical table (ties possible only where clipping saturates);
    # re-encoding at the estimate must reproduce the same table
    for q in range(1, 101):
        est = estimate_quality(quant_table(q))
        assert 1 <= est <= q
        assert np.array_equal(quant_table(est), quant_table(q))


def test_estimate_quality_is_identity_in_fixture_range():
    # the fixture range 25..95 is strictly monotone in the IJG map:
    # inversion is exact identity there
    for i in range(71):
        q = true_quality(i)
        assert 25 <= q <= 95
        assert estimate_quality(quant_table(q)) == q


def test_parse_dqt_skips_app_segments():
    data = encode_jpeg_gray8(IMG, quality=60, extra_app=b"PAYLOADXYZ" * 20)
    assert np.array_equal(parse_dqt(data), quant_table(60))


def test_distributed_rows_match_ground_truth(spark):
    rows = jpeg_quality_rows(generate_images_df(spark, 12)).collect()
    assert len(rows) == 12
    for r in rows:
        i = int(r.image_id.split("_")[1])
        assert r.true_q == true_quality(i)
        assert r.est_q == r.true_q  # exact inversion on real bytes
        assert r.dqt_sum == int(quant_table(r.true_q).sum())
        assert r.keep == (r.est_q >= KEEP_Q)
    # fixture spans both sides of the keep gate
    keeps = {r.keep for r in rows}
    assert keeps == {True, False}
