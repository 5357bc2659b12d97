"""Ordinary kriging: solver properties, replay parity, partition invariance."""

import numpy as np
import pytest

from data_model_spark.operators.kriging import (
    BOX,
    MIN_PTS,
    N,
    NUGGET,
    RES,
    SILL,
    VRANGE,
    _ok_solve,
    gamma,
    kriging_grid,
    kriging_surface,
    replay_rows,
    synthetic_points,
)
from data_model_spark.operators.surfaces import grid_window


def test_variogram_model_shape():
    assert gamma(np.array([0.0]))[0] == 0.0
    h = np.array([1e-9, VRANGE / 2, VRANGE, 2 * VRANGE])
    g = gamma(h)
    assert g[0] == pytest.approx(NUGGET, abs=1e-6)  # nugget discontinuity
    assert g[1] < g[2]  # monotone ramp
    assert g[2] == g[3] == NUGGET + SILL  # sill plateau beyond range


def test_exact_interpolation_weights_sum_to_one():
    # the OK weights reproduce a constant field exactly: predicting a
    # constant from constant observations returns the constant
    rng = np.random.default_rng(5)
    lon = 10.0 + rng.random(6) * 0.05
    lat = 46.0 + rng.random(6) * 0.05
    val = np.full(6, 42.5)
    pred_q, _ = _ok_solve(lon, lat, val, 10.02, 46.02)
    assert pred_q == int(np.floor(42.5 * 1e6 + 0.5))


def test_kriging_variance_positive_away_from_points():
    rng = np.random.default_rng(6)
    lon = 10.0 + rng.random(5) * 0.01
    lat = 46.0 + rng.random(5) * 0.01
    val = rng.random(5) * 10
    _, var_q = _ok_solve(lon, lat, val, 10.5, 46.5)  # far target
    assert var_q > int((NUGGET + SILL) * 1e6 * 0.5)  # approaches the sill


def test_engine_matches_replay(spark):
    got = {
        (r.tx, r.ty): (r.n_pts, r.pred_q, r.var_q)
        for r in kriging_surface(spark, "").collect()
    }
    exp = {(tx, ty): (m, p, v) for tx, ty, m, p, v in replay_rows()}
    assert got == exp
    assert len(exp) > 100  # non-vacuous window
    assert all(m >= MIN_PTS for m, _, _ in exp.values())


def test_partition_invariance(spark):
    pts = synthetic_points(spark).repartition(17)
    targets = grid_window(spark, RES, *BOX).repartition(5)
    got = {
        (r.tx, r.ty): (r.n_pts, r.pred_q, r.var_q)
        for r in kriging_grid(pts, targets).collect()
    }
    exp = {(tx, ty): (m, p, v) for tx, ty, m, p, v in replay_rows()}
    assert got == exp
