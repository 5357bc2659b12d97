"""Distributed convex hull: brute-force oracle, degenerate inputs,
partition-independence."""

import numpy as np
import pytest

from data_model_spark.operators.hull import _chain, convex_hull


def _brute_vertices(pts: np.ndarray) -> set[int]:
    """Strict hull vertices by the cover definition (int-exact)."""
    ids, x, y = pts[:, 0], pts[:, 1], pts[:, 2]
    n = len(pts)

    def cross(a, b, c):
        return (x[b] - x[a]) * (y[c] - y[a]) - (y[b] - y[a]) * (x[c] - x[a])

    out = set()
    for p in range(n):
        covered = False
        for a in range(n):
            if a == p or covered:
                continue
            for b in range(a + 1, n):
                if b == p or covered:
                    continue
                # segment cover
                if cross(a, b, p) == 0 and (x[p] - x[a]) * (x[p] - x[b]) + (
                    y[p] - y[a]
                ) * (y[p] - y[b]) <= 0:
                    covered = True
                    break
                for c in range(b + 1, n):
                    if c == p:
                        continue
                    if cross(a, b, c) == 0:
                        continue
                    s1, s2, s3 = cross(a, b, p), cross(b, c, p), cross(c, a, p)
                    if (s1 >= 0 and s2 >= 0 and s3 >= 0) or (
                        s1 <= 0 and s2 <= 0 and s3 <= 0
                    ):
                        covered = True
                        break
        if not covered:
            out.add(int(ids[p]))
    return out


def _spark_vertices(spark, rows, parts):
    df = spark.createDataFrame(
        [(int(i), int(a), int(b)) for i, a, b in rows],
        "point_id long, x long, y long",
    ).repartition(parts)
    return {int(r.point_id) for r in convex_hull(df).collect()}


def test_matches_cover_definition(spark):
    rng = [(k, (k * 613) % 401, (k * 271) % 397) for k in range(60)]
    pts = np.array(rng, dtype=np.int64)
    want = _brute_vertices(pts)
    for parts in (1, 7, 32):
        assert _spark_vertices(spark, rng, parts) == want
    assert 3 <= len(want) < 60


def test_collinear_only_endpoints(spark):
    rows = [(k, 3 * k, 6 * k) for k in range(10)]
    assert _spark_vertices(spark, rows, 4) == {0, 9}


def test_square_with_edge_midpoints(spark):
    # midpoints of edges are NOT strict vertices
    rows = [
        (0, 0, 0), (1, 4, 0), (2, 4, 4), (3, 0, 4),
        (4, 2, 0), (5, 4, 2), (6, 2, 4), (7, 0, 2), (8, 2, 2),
    ]
    assert _spark_vertices(spark, rows, 3) == {0, 1, 2, 3}


def test_tiny_inputs(spark):
    assert _spark_vertices(spark, [(7, 5, 5)], 2) == {7}
    assert _spark_vertices(spark, [(1, 0, 0), (2, 9, 1)], 2) == {1, 2}


def test_local_chain_equals_final(spark):
    # stage-1 pruning loses nothing: candidates' hull == full hull
    rng = [(k, (k * 613) % 401, (k * 271) % 397) for k in range(500)]
    import pandas as pd

    pdf = pd.DataFrame(rng, columns=["point_id", "x", "y"])
    single = set(_chain(pdf)["point_id"])
    assert _spark_vertices(spark, rng, 32) == single
