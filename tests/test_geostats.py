"""Variogram / Ripley K: bucket-join completeness, exactness, physics."""

import numpy as np

from data_model_spark.operators.geostats import (
    K_RADII,
    N_BINS,
    R_MAX,
    empirical_variogram,
    field_points,
    ripley_k_counts,
)
from data_model_spark.sources.tables import load_table


def _brute(points):
    """Driver-side exhaustive pair sweep: {(lag_bin): (n, ss)}, {r: n}."""
    pts = np.array([(p.point_id, p.px, p.py, p.z) for p in points], np.int64)
    bins = {}
    kcnt = {r: 0 for r in K_RADII}
    for i in range(len(pts)):
        d2 = (pts[i + 1 :, 1] - pts[i, 1]) ** 2 + (pts[i + 1 :, 2] - pts[i, 2]) ** 2
        sq = (pts[i + 1 :, 3] - pts[i, 3]) ** 2
        sel = (d2 > 0) & (d2 <= R_MAX * R_MAX)
        for d, s in zip(d2[sel], sq[sel]):
            b = int(np.floor(np.sqrt(float(d)))) * N_BINS // R_MAX
            n, ss = bins.get(b, (0, 0))
            bins[b] = (n + 1, ss + int(s))
        for r in K_RADII:
            kcnt[r] += int(((d2 > 0) & (d2 <= r * r)).sum())
    return bins, kcnt


def test_variogram_matches_exhaustive(spark, sf_dir):
    pts = field_points(load_table(spark, sf_dir, "customer"))
    got = {r.lag_bin: (r.n_pairs, r.sum_sqdiff)
           for r in empirical_variogram(pts).collect()}
    exp, _ = _brute(pts.collect())
    assert got == exp
    assert sum(n for n, _ in got.values()) > 50  # non-vacuous


def test_variogram_rises_with_lag(spark, sf_dir):
    # drift-dominated field: gamma at long lags exceeds gamma at short
    pts = field_points(load_table(spark, sf_dir, "customer"))
    rows = {r.lag_bin: r.sum_sqdiff / (2 * r.n_pairs)
            for r in empirical_variogram(pts).collect()}
    short = min(k for k in rows if k >= 0)
    long_ = max(rows)
    assert long_ > short
    assert rows[long_] > 2 * rows[short]


def test_ripley_matches_exhaustive_and_is_monotone(spark, sf_dir):
    pts = field_points(load_table(spark, sf_dir, "customer"))
    got = {r.radius: r.n_pairs for r in ripley_k_counts(pts).collect()}
    _, exp = _brute(pts.collect())
    assert got == {r: n for r, n in exp.items() if n > 0}
    vals = [got.get(r, 0) for r in sorted(K_RADII)]
    assert vals == sorted(vals)  # cumulative counts are monotone
    assert vals[-1] > vals[0] > 0


def test_pair_join_emits_each_pair_once(spark, sf_dir):
    from data_model_spark.operators.geostats import _pairs

    pts = field_points(load_table(spark, sf_dir, "customer"))
    rows = _pairs(pts).select("id_a", "id_b").collect()
    keys = [(r.id_a, r.id_b) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)
