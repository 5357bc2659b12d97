"""Co-movement (convoy) tests: brute-force completeness on random
bucketed fixes, gaps-and-islands run assembly, exactly-once pair
emission, the cell-too-fine guard, and parallelism determinism."""

import itertools

import numpy as np
import pytest

from data_model_spark.operators.trajectory import comovement


def _fixes_df(spark, rows):
    return spark.createDataFrame(
        rows, "key long, tb long, x long, y long"
    )


def _brute(rows, d2, min_run):
    """Sequential reference: per-bucket all-pairs + run scan."""
    comp = {}
    by_tb = {}
    for k, tb, x, y in rows:
        by_tb.setdefault(tb, []).append((k, x, y))
    for tb, pts in by_tb.items():
        for (ka, ax, ay), (kb, bx, by_) in itertools.combinations(pts, 2):
            if ka > kb:
                ka, kb, ax, ay, bx, by_ = kb, ka, bx, by_, ax, ay
            if (ax - bx) ** 2 + (ay - by_) ** 2 <= d2:
                comp.setdefault((ka, kb), set()).add(tb)
    out = {}
    for pair, tbs in comp.items():
        s = sorted(tbs)
        best = run = 1
        for p, q in zip(s, s[1:]):
            run = run + 1 if q == p + 1 else 1
            best = max(best, run)
        if best >= min_run:
            out[pair] = (len(s), best)
    return out


def _collect(df):
    return {
        (r.key_a, r.key_b): (r.n_buckets, r.max_run) for r in df.collect()
    }


def test_matches_bruteforce_random(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(k), int(tb), int(rng.integers(-200, 200)), int(rng.integers(-200, 200)))
        for k in range(12)
        for tb in range(15)
        if rng.random() < 0.8  # holes force run breaks
    ]
    d2, m = 3600, 2
    got = _collect(comovement(_fixes_df(spark, rows), d2, m, cell_shift=6))
    assert got == _brute(rows, d2, m)


def test_run_assembly_islands(spark):
    # companions on days 0,1,2 then 5,6 -> n_buckets 5, max_run 3
    rows = []
    for tb in (0, 1, 2, 5, 6):
        rows += [(1, tb, 0, 0), (2, tb, 10, 0)]
    rows += [(1, 3, 0, 0), (2, 3, 5000, 0)]  # far apart on day 3
    got = _collect(comovement(_fixes_df(spark, rows), 900, 3, cell_shift=5))
    assert got == {(1, 2): (5, 3)}


def test_min_run_filters(spark):
    rows = [(1, tb, 0, 0) for tb in (0, 2, 4)] + [
        (2, tb, 1, 1) for tb in (0, 2, 4)
    ]
    # three companion buckets but never consecutive
    out = comovement(_fixes_df(spark, rows), 900, 2, cell_shift=5)
    assert out.count() == 0


def test_cross_cell_pair_found_once(spark):
    # straddle a 64-unit cell border: x=63 vs x=65, d=2
    rows = [(1, 0, 63, 0), (2, 0, 65, 0)]
    out = comovement(_fixes_df(spark, rows), 3600, 1, cell_shift=6).collect()
    assert len(out) == 1 and out[0].n_buckets == 1


def test_cell_too_fine_guard(spark):
    with pytest.raises(ValueError, match="coarser"):
        comovement(_fixes_df(spark, [(1, 0, 0, 0)]), 3600, 1, cell_shift=5)


def test_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(3)
    rows = [
        (int(k), int(tb), int(rng.integers(-500, 500)), int(rng.integers(-500, 500)))
        for k in range(20)
        for tb in range(10)
    ]
    df = _fixes_df(spark, rows)
    a = sorted(map(tuple, comovement(df.repartition(1), 10000, 2, 7).collect()))
    b = sorted(map(tuple, comovement(df.repartition(13), 10000, 2, 7).collect()))
    assert a == b and len(a) > 0
