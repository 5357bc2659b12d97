"""Map-matching tests: NumPy brute-force equality on the fixture, endpoint
clamping, deterministic tie-break, radius exclusion, parallelism."""

import numpy as np

from data_model_spark.operators.mapmatch import (
    _roads_df,
    _street_values,
    _walk_pings,
    map_match,
)


def _ref(pings, roads, r2):
    out = {}
    for pid, px, py in pings:
        best = None
        for sid, ax, ay, bx, by in roads:
            apx, apy = px - ax, py - ay
            abx, aby = bx - ax, by - ay
            dot = apx * abx + apy * aby
            L = abx * abx + aby * aby
            if dot <= 0:
                d2 = float(apx * apx + apy * apy)
            elif dot >= L:
                d2 = float((px - bx) ** 2 + (py - by) ** 2)
            else:
                d2 = float((apx * apx + apy * apy) * L - dot * dot) / float(L)
            if d2 <= r2 and (best is None or (d2, sid) < best):
                best = (d2, sid)
        if best is not None:
            out[pid] = (best[1], int(round(best[0] * 1e6)))
    return out


def test_matches_bruteforce_on_fixture(spark, sf_dir):
    pings = _walk_pings(spark, sf_dir)
    rows = [(r.point_id, r.px, r.py) for r in pings.collect()]
    want = _ref(rows, _street_values(), 10000)
    got = {r.point_id: (r.seg_id, r.dist_q)
           for r in map_match(pings, _roads_df(spark), r2=10000, cell_shift=7).collect()}
    assert got == want
    assert len(got) >= 500  # non-vacuous


def test_endpoint_clamp_and_exclusion(spark):
    pings = spark.createDataFrame(
        [(1, -50, 0), (2, 50, 40), (3, 5000, 5000)],
        "point_id long, px long, py long",
    )
    roads = spark.createDataFrame([(7, 0, 0, 100, 0)],
                                  "seg_id long, ax long, ay long, bx long, by long")
    got = {r.point_id: (r.seg_id, r.dist_q)
           for r in map_match(pings, roads, r2=3000, cell_shift=6).collect()}
    # ping 1 clamps to endpoint A -> d2 = 2500; ping 2 projects interior -> 1600
    assert got == {1: (7, 2500_000000), 2: (7, 1600_000000)}


def test_tie_breaks_on_lowest_seg_id(spark):
    pings = spark.createDataFrame([(1, 50, 50)], "point_id long, px long, py long")
    roads = spark.createDataFrame(
        [(9, 0, 0, 100, 0), (4, 0, 100, 100, 100)],  # both at distance 50
        "seg_id long, ax long, ay long, bx long, by long",
    )
    got = map_match(pings, roads, r2=2500, cell_shift=6).collect()
    assert [(r.point_id, r.seg_id) for r in got] == [(1, 4)]


def test_deterministic_across_parallelism(spark, sf_dir):
    pings = _walk_pings(spark, sf_dir)
    roads = _roads_df(spark)
    a = sorted(map(tuple, map_match(pings.repartition(1), roads, 10000, 7).collect()))
    b = sorted(map(tuple, map_match(pings.repartition(13), roads, 10000, 7).collect()))
    assert a == b


def test_cell_smaller_than_radius_rejected(spark):
    import pytest

    pings = spark.createDataFrame([(1, 0, 0)], "point_id long, px long, py long")
    roads = spark.createDataFrame([(1, 0, 0, 1, 0)],
                                  "seg_id long, ax long, ay long, bx long, by long")
    with pytest.raises(ValueError):
        map_match(pings, roads, r2=10000, cell_shift=5)
