"""Wasserstein-1 drift tests: NumPy CDF-integral reference equality on
random groups, the shift identity W1(X, X+c) = c, zero self-distance,
unequal sample sizes, and parallelism determinism."""

import numpy as np

from data_model_spark.operators.drift import w1_pairs


def _df(spark, groups):
    rows = [(g, int(v)) for g, vs in groups.items() for v in vs]
    return spark.createDataFrame(rows, "g string, v long")


def _ref_w1(a, b):
    a, b = np.sort(np.asarray(a)), np.sort(np.asarray(b))
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    return float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(grid)))


def _collect(spark, groups):
    return {
        (r.g_a, r.g_b): (r.n_a, r.n_b, r.w1)
        for r in w1_pairs(_df(spark, groups)).collect()
    }


def test_matches_reference_random(spark):
    rng = np.random.default_rng(6)
    groups = {
        f"s{i}": rng.integers(0, 400, rng.integers(20, 60)) for i in range(5)
    }
    got = _collect(spark, groups)
    assert len(got) == 10
    for (ga, gb), (na, nb, w1) in got.items():
        assert (na, nb) == (len(groups[ga]), len(groups[gb]))
        assert abs(w1 - _ref_w1(groups[ga], groups[gb])) < 1e-9, (ga, gb)


def test_shift_identity(spark):
    rng = np.random.default_rng(1)
    base = rng.integers(0, 100, 40)
    got = _collect(spark, {"a": base, "b": base + 17})
    assert abs(got[("a", "b")][2] - 17.0) < 1e-12


def test_identical_distributions_zero(spark):
    vals = [1, 5, 5, 9]
    got = _collect(spark, {"a": vals, "b": vals})
    assert got[("a", "b")][2] == 0.0


def test_unequal_sizes_exact(spark):
    # a = {0}, b = {0,0,2}: F_a = 1 on [0,2); F_b = 2/3 then 1.
    # W1 = |1 - 2/3| * 2 = 2/3
    got = _collect(spark, {"a": [0], "b": [0, 0, 2]})
    assert abs(got[("a", "b")][2] - 2.0 / 3.0) < 1e-15


def test_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(12)
    groups = {f"s{i}": rng.integers(0, 1000, 50) for i in range(6)}
    df = _df(spark, groups)
    a = sorted(map(tuple, w1_pairs(df.repartition(1)).collect()))
    b = sorted(map(tuple, w1_pairs(df.repartition(9)).collect()))
    assert a == b and len(a) == 15
