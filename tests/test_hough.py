"""Hough peak: synthetic-line goldens + determinism."""

import numpy as np

from data_model_spark.operators.hough import (
    N_THETA,
    hough_features,
)


def _blank():
    return np.zeros((256, 256), np.uint16)


def test_vertical_line_peak():
    t = _blank()
    t[:, 100] = 5000  # step edges flank the bright column
    n, ti, rho, votes = hough_features(t)
    assert n > 0
    assert ti == 0  # theta = 0: rho = x
    assert rho in (99, 100, 101)
    assert votes >= 200


def test_horizontal_line_peak():
    t = _blank()
    t[50, :] = 5000
    n, ti, rho, votes = hough_features(t)
    assert ti == N_THETA // 2  # theta = pi/2: rho = y
    assert rho in (49, 50, 51)
    assert votes >= 200


def test_diagonal_line_peak():
    t = _blank()
    idx = np.arange(256)
    t[idx, idx] = 5000  # y = x -> normal at 3*pi/4, rho ~ 0
    n, ti, rho, votes = hough_features(t)
    assert ti == (3 * N_THETA) // 4
    assert abs(rho) <= 1
    assert votes >= 150


def test_empty_tile():
    assert hough_features(_blank()) == (0, 0, 0, 0)


def test_deterministic():
    rng = np.random.default_rng(3)
    t = rng.integers(0, 5000, (256, 256)).astype(np.uint16)
    assert hough_features(t) == hough_features(t.copy())
