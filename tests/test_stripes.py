"""Stripe QA: planted-stripe detection + replay parity."""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.stripes import (
    N_IMG,
    THRESH,
    stripe_features,
    stripe_qa_fp,
)
from data_model_spark.operators.upsample import _CK_MOD, _CK_MUL


def test_clean_tile_no_flags():
    t = np.full((256, 256), 1000, np.uint16)
    n, mx, ck = stripe_features(t)
    assert (n, mx, ck) == (0, 0, 0)


def test_planted_stripe_detected_and_localized():
    t = np.full((256, 256), 1000, np.uint16)
    t[:, 77] += 300  # mis-calibrated column: +300 DN over 256 rows
    n, mx, ck = stripe_features(t)
    # second difference at the stripe: 2*(s+300*256) - s - s = 600*256
    assert mx == 600 * 256
    # flagged: the stripe column and its two neighbors (their second
    # differences each see the stripe once: |d| = 300*256 > THRESH)
    assert n == 3
    exp_ck = sum((c * _CK_MUL) % _CK_MOD for c in (76, 77, 78))
    assert ck == exp_ck


def test_smooth_gradient_not_flagged():
    # linear ramp: second difference is exactly zero
    t = (np.arange(256, dtype=np.uint16)[None, :] * 10).repeat(256, axis=0)
    n, mx, ck = stripe_features(t)
    assert n == 0 and mx == 0


def test_engine_matches_replay(spark):
    got = {
        (r.var, r.tile_x, r.tile_y): (r.n_flagged, r.max_absd, r.ck)
        for r in stripe_qa_fp(spark, "").collect()
    }
    cv = replay.merged_canvases(N_IMG)
    assert len(got) == len(cv)
    for key in sorted(cv):
        assert got[key] == stripe_features(cv[key]), key
