"""Segment-intersection join: brute-force equality + predicate goldens."""

from pyspark.sql import functions as F

from data_model_spark.operators.overlay_segments import (
    INTERSECT_PRED,
    _segments_df,
    segment_intersection_join,
)
from data_model_spark.sources.tables import load_table


def _brute(spark, a, b):
    return (
        a.crossJoin(b).filter(F.expr(INTERSECT_PRED)).select("a_id", "b_id")
    )


def test_matches_bruteforce_and_nonvacuous(spark):
    sf = "/root/testdata/sf0.01"
    a = _segments_df(load_table(spark, sf, "customer"), "c_custkey", "a_id", "a")
    b = _segments_df(load_table(spark, sf, "supplier"), "s_suppkey", "b_id", "b")
    got = sorted(map(tuple, segment_intersection_join(a, b).collect()))
    want = sorted(map(tuple, _brute(spark, a, b).collect()))
    assert got == want
    assert len(got) > 10  # non-vacuous at sf0.01
    assert len(got) == len(set(got))  # exactly-once emit


def test_predicate_goldens(spark):
    # (a, b, expected): proper cross, T-touch, collinear overlap, endpoint
    # touch, parallel disjoint, collinear disjoint, bbox-overlap miss
    cases = [
        ((0, 0, 10, 10), (0, 10, 10, 0), True),  # X crossing
        ((0, 0, 10, 0), (5, 0, 5, 7), True),  # T touch at (5,0)
        ((0, 0, 10, 0), (5, 0, 15, 0), True),  # collinear overlap
        ((0, 0, 10, 0), (10, 0, 20, 5), True),  # endpoint touch
        ((0, 0, 10, 0), (0, 1, 10, 1), False),  # parallel disjoint
        ((0, 0, 4, 0), (5, 0, 9, 0), False),  # collinear disjoint
        ((0, 0, 10, 1), (9, 5, 10, 2), False),  # bboxes overlap, no cross
    ]
    rows = [(i, *a, *b) for i, (a, b, _) in enumerate(cases)]
    df = spark.createDataFrame(
        rows,
        "id long, ax0 long, ay0 long, ax1 long, ay1 long,"
        " bx0 long, by0 long, bx1 long, by1 long",
    )
    got = {
        r.id: r.hit
        for r in df.select("id", F.expr(INTERSECT_PRED).alias("hit")).collect()
    }
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i])


def test_duckdb_predicate_agrees(spark):
    import duckdb

    cases = [
        (0, 0, 10, 10, 0, 10, 10, 0),
        (0, 0, 10, 0, 5, 0, 5, 7),
        (0, 0, 10, 0, 0, 1, 10, 1),
        (0, 0, 4, 0, 5, 0, 9, 0),
    ]
    vals = ", ".join(f"({i}, {', '.join(map(str, c))})" for i, c in enumerate(cases))
    duck = duckdb.sql(
        f"WITH v(id, ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) AS (VALUES {vals}) "
        f"SELECT id, ({INTERSECT_PRED}) AS hit FROM v ORDER BY id"
    ).fetchall()
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "id long, ax0 long, ay0 long, ax1 long, ay1 long,"
        " bx0 long, by0 long, bx1 long, by1 long",
    )
    sp = {
        r.id: r.hit
        for r in df.select("id", F.expr(INTERSECT_PRED).alias("hit")).collect()
    }
    for i, hit in duck:
        assert sp[i] == hit, i
