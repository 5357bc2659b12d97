"""Standard deviational ellipse: closed-form eigen axes vs NumPy."""

import numpy as np
import pandas as pd

from data_model_spark.operators.sde import sde_per_group


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "xm", "ym"])
    )


def test_isotropic_cloud_axes_equal(spark):
    # 4 points at the corners of a square: vx == vy, cov == 0
    rows = [("a", 0, 0), ("a", 0, 10), ("a", 10, 0), ("a", 10, 10)]
    r = sde_per_group(_df(spark, rows)).collect()[0]
    assert r.mx_q == 5_000_000 and r.my_q == 5_000_000
    assert r.maj_q == r.min_q == 5_000_000  # sigma = 5 on both axes


def test_degenerate_line_minor_axis_zero(spark):
    rows = [("a", 0, 0), ("a", 10, 10), ("a", 20, 20)]
    r = sde_per_group(_df(spark, rows)).collect()[0]
    assert r.min_q == 0
    # major axis = std along the diagonal: sqrt(2 * var_x)
    vx = np.var([0, 10, 20])
    assert r.maj_q == int(np.floor(np.sqrt(2 * vx) * 1e6 + 0.5))


def test_matches_numpy_eigvals(spark):
    rng = np.random.default_rng(2)
    xs = rng.integers(0, 2000, 300)
    ys = (xs * 0.7 + rng.integers(0, 300, 300)).astype(np.int64)
    rows = [("g", int(x), int(y)) for x, y in zip(xs, ys)]
    r = sde_per_group(_df(spark, rows)).collect()[0]
    cov = np.cov(np.stack([xs, ys]), bias=True)
    lam = np.sort(np.linalg.eigvalsh(cov))
    assert abs(r.maj_q / 1e6 - np.sqrt(lam[1])) < 1e-4
    assert abs(r.min_q / 1e6 - np.sqrt(lam[0])) < 1e-4


def test_groups_independent(spark):
    rows = [("a", 0, 0), ("a", 2, 2), ("b", 100, 0), ("b", 100, 50)]
    got = {r.grp: (r.n, r.mx_q, r.my_q) for r in
           sde_per_group(_df(spark, rows)).collect()}
    assert got["a"] == (2, 1_000_000, 1_000_000)
    assert got["b"] == (2, 100_000_000, 25_000_000)
