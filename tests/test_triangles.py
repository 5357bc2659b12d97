"""Triangle counting: closed-form graphs, orientation invariants."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.triangles import triangle_counts


def _counts(spark, edges, parts=4):
    df = spark.createDataFrame(edges, "u long, v long").repartition(parts)
    return {int(r.node): int(r.n_tri) for r in triangle_counts(df).collect()}


def test_k4_every_node_three(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _counts(spark, k4) == {0: 3, 1: 3, 2: 3, 3: 3}


def test_cycle_and_star_have_none(spark):
    cycle = [(i, (i + 1) % 6) for i in range(6)]
    assert _counts(spark, cycle) == {}
    star = [(0, i) for i in range(1, 8)]
    assert _counts(spark, star) == {}


def test_two_triangles_sharing_an_edge(spark):
    edges = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    assert _counts(spark, edges) == {0: 1, 1: 2, 2: 2, 3: 1}


def test_duplicates_selfloops_direction_ignored(spark):
    base = [(0, 1), (1, 2), (0, 2)]
    noisy = base + [(1, 0), (2, 1), (0, 0), (1, 1), (0, 1)]
    assert _counts(spark, noisy) == {0: 1, 1: 1, 2: 1}


def test_matches_numpy_on_random_graph(spark):
    edges = sorted(
        {
            (min(a, b), max(a, b))
            for k in range(300)
            for a, b in [((k * 613) % 40, (k * 271) % 40)]
            if a != b
        }
    )
    got = _counts(spark, edges, parts=8)
    # adjacency-matrix truth: diag(A^3)/2 per node
    A = np.zeros((40, 40), dtype=np.int64)
    for a, b in edges:
        A[a, b] = A[b, a] = 1
    diag = np.diagonal(np.linalg.matrix_power(A, 3)) // 2
    want = {i: int(diag[i]) for i in range(40) if diag[i]}
    assert got == want
