"""Skyline operator: brute-force dominance oracle, ties, directions."""

import numpy as np
import pytest

from data_model_spark.operators.skyline import _local_skyline, skyline


def _brute(rows, signs):
    vals = np.array([r[1:] for r in rows], dtype=np.int64) * signs
    keep = set()
    for i, r in enumerate(rows):
        dominated = any(
            (vals[j] >= vals[i]).all() and (vals[j] > vals[i]).any()
            for j in range(len(rows))
            if j != i
        )
        if not dominated:
            keep.add(r[0])
    return keep


def _spark_ids(spark, rows, parts, maximize, minimize):
    cols = "id long, a long, b long"
    df = spark.createDataFrame(rows, cols).repartition(parts)
    return {
        int(r.id)
        for r in skyline(df, maximize=maximize, minimize=minimize, id_col="id").collect()
    }


def test_matches_bruteforce_all_directions(spark):
    rows = [(k, (k * 613) % 101, (k * 271) % 97) for k in range(120)]
    for maxi, mini, signs in [
        (["a", "b"], [], np.array([1, 1])),
        (["a"], ["b"], np.array([1, -1])),
        ([], ["a", "b"], np.array([-1, -1])),
    ]:
        want = _brute(rows, signs)
        for parts in (1, 8, 32):
            assert _spark_ids(spark, rows, parts, maxi, mini) == want
        assert 0 < len(want) < 120


def test_identical_points_both_survive(spark):
    rows = [(0, 10, 10), (1, 10, 10), (2, 5, 5)]
    got = _spark_ids(spark, rows, 2, ["a", "b"], [])
    assert got == {0, 1}


def test_single_attribute_is_argmax(spark):
    rows = [(k, k % 7, 0) for k in range(20)]
    got = _spark_ids(spark, rows, 4, ["a"], [])
    assert got == {k for k in range(20) if k % 7 == 6}


def test_requires_attributes(spark):
    df = spark.createDataFrame([(1, 2, 3)], "id long, a long, b long")
    with pytest.raises(ValueError, match="at least one attribute"):
        skyline(df)


def test_local_kernel_chunking():
    import pandas as pd

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "id": np.arange(3000),
            "a": rng.randint(0, 500, 3000),
            "b": rng.randint(0, 500, 3000),
        }
    )
    signs = np.array([1, 1], dtype=np.int64)
    got = set(_local_skyline(pdf, signs)["id"])
    vals = pdf[["a", "b"]].to_numpy(np.int64)
    want = set()
    for i in range(len(vals)):
        ge = (vals >= vals[i]).all(axis=1)
        gt = (vals > vals[i]).any(axis=1)
        if not (ge & gt).any():
            want.add(i)
    assert got == want
