"""Interval-join tests: brute-force completeness on random intervals,
the exactly-once emit rule (pairs spanning many shared buckets),
touching-interval semantics, keyed partitioning, and parallelism
determinism."""

import itertools

import numpy as np

from data_model_spark.operators.intervals import interval_join


def _df(spark, rows, key=True):
    schema = "id long, key long, lo long, hi long" if key else "id long, lo long, hi long"
    return spark.createDataFrame(rows, schema)


def _brute(a, b, keyed=True):
    out = {}
    for ra, rb in itertools.product(a, b):
        if keyed:
            (ia, ka, la, ha), (ib, kb, lb, hb) = ra, rb
            if ka != kb:
                continue
        else:
            (ia, la, ha), (ib, lb, hb) = ra, rb
        if la <= hb and lb <= ha:
            out[(ia, ib)] = min(ha, hb) - max(la, lb)
    return out


def test_matches_bruteforce_random(spark):
    rng = np.random.default_rng(17)

    def mk(n):
        rows = []
        for i in range(n):
            lo = int(rng.integers(0, 10_000))
            rows.append((i, int(rng.integers(0, 4)), lo, lo + int(rng.integers(0, 900))))
        return rows

    a, b = mk(60), mk(60)
    got = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_join(_df(spark, a), _df(spark, b), bucket_us=512).collect()
    }
    assert got == _brute(a, b)


def test_exactly_once_across_many_buckets(spark):
    # both intervals cover 10+ buckets; the pair must appear ONCE
    a = [(1, 0, 0, 10_000)]
    b = [(2, 0, 500, 9_000)]
    rows = interval_join(_df(spark, a), _df(spark, b), bucket_us=700).collect()
    assert len(rows) == 1 and rows[0].overlap_us == 8_500


def test_touching_intervals_zero_overlap(spark):
    a = [(1, 0, 0, 100)]
    b = [(2, 0, 100, 200), (3, 0, 101, 200)]
    got = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_join(_df(spark, a), _df(spark, b), bucket_us=64).collect()
    }
    assert got == {(1, 2): 0}


def test_key_partitions_isolate(spark):
    a = [(1, 7, 0, 100)]
    b = [(2, 8, 0, 100)]  # same time, different key
    assert interval_join(_df(spark, a), _df(spark, b), bucket_us=64).count() == 0


def test_unkeyed_mode(spark):
    a = [(1, 0, 50)]
    b = [(2, 40, 90), (3, 60, 70)]
    got = {
        (r.a_id, r.b_id): r.overlap_us
        for r in interval_join(
            _df(spark, a, key=False), _df(spark, b, key=False),
            bucket_us=32, key=None,
        ).collect()
    }
    assert got == {(1, 2): 10}


def test_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(2)
    rows = [
        (i, int(rng.integers(0, 3)), int(lo := rng.integers(0, 5000)),
         int(lo + rng.integers(0, 400)))
        for i in range(80)
    ]
    da, db = _df(spark, rows), _df(spark, rows)
    x = sorted(map(tuple, interval_join(da.repartition(1), db.repartition(1), 256).collect()))
    y = sorted(map(tuple, interval_join(da.repartition(13), db.repartition(7), 256).collect()))
    assert x == y and len(x) > 50
