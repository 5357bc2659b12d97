"""Exact EDT: brute-force cross-check + degenerate masks."""

import numpy as np

from data_model_spark.operators.edt import G_CAP, sq_edt


def brute_d2(mask):
    h, w = mask.shape
    ys, xs = np.nonzero(mask)
    out = np.full((h, w), G_CAP * G_CAP, np.int64)
    if xs.size:
        yy, xx = np.mgrid[0:h, 0:w]
        # exact min over all feature pixels (but capped per the kernel's
        # row sentinel: rows with no feature clip their 1D leg at G_CAP)
        d = ((yy[:, :, None] - ys[None, None, :]) ** 2
             + (xx[:, :, None] - xs[None, None, :]) ** 2).min(axis=2)
        out = d
    return out


def test_matches_bruteforce_random():
    rng = np.random.default_rng(11)
    for _ in range(5):
        mask = rng.random((40, 40)) < 0.05
        if not mask.any():
            mask[20, 20] = True
        assert (sq_edt(mask) == brute_d2(mask)).all()


def test_single_feature_pixel():
    mask = np.zeros((32, 32), bool)
    mask[5, 7] = True
    d2 = sq_edt(mask)
    assert d2[5, 7] == 0
    assert d2[5, 10] == 9
    assert d2[8, 7] == 9
    assert d2[0, 0] == 25 + 49


def test_full_mask_is_zero():
    assert (sq_edt(np.ones((16, 16), bool)) == 0).all()


def test_empty_mask_is_capped():
    d2 = sq_edt(np.zeros((16, 16), bool))
    assert (d2 == G_CAP * G_CAP).all()
