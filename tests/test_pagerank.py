"""Fixed-point PageRank: hand-computed goldens, plan-independence, mass."""

import pytest
from pyspark.sql import functions as F

from data_model_spark.operators.pagerank import SCALE, pagerank_fixedpoint


def _ranks(df):
    return {int(r.node): int(r.rank) for r in df.collect()}


def test_star_graph_golden(spark):
    # hub 0 <-> leaves 1..4 (symmetrized): n=5, r0 = SCALE//5
    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = _ranks(pagerank_fixedpoint(df, iterations=1))
    r0 = SCALE // 5
    base = r0 * 15 // 100
    # hub receives each leaf's whole rank (deg 1); leaves get hub_rank/4
    assert got[0] == base + 85 * (4 * (r0 // 1)) // 100
    for i in range(1, 5):
        assert got[i] == base + 85 * (r0 // 4) // 100


def test_two_iteration_golden(spark):
    edges = [(0, 1), (1, 0), (1, 2), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    n = 3
    r = {i: SCALE // n for i in range(n)}
    deg = {0: 1, 1: 2, 2: 1}
    base = (SCALE // n) * 15 // 100
    out_edges = {0: [1], 1: [0, 2], 2: [1]}
    for _ in range(2):
        s = {i: 0 for i in range(n)}
        for u, vs in out_edges.items():
            for v in vs:
                s[v] += r[u] // deg[u]
        r = {i: base + 85 * s[i] // 100 for i in range(n)}
    got = _ranks(pagerank_fixedpoint(df, iterations=2))
    assert got == r


def test_parallelism_independent(spark):
    edges = [(i, (i * 7) % 40) for i in range(40) if i != (i * 7) % 40]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = _ranks(pagerank_fixedpoint(df.coalesce(1), iterations=3))
    b = _ranks(pagerank_fixedpoint(df.repartition(32), iterations=3))
    assert a == b  # bit-exact at any parallelism — the fixed-point contract


def test_mass_conserved_within_truncation(spark):
    edges = [(i, j) for i in range(20) for j in range(20) if (i + j) % 7 == 1]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank_fixedpoint(df, iterations=3)
    total = out.agg(F.sum("rank")).collect()[0][0]
    n = out.count()
    # each node truncates < 100 units/iteration in the damping divides plus
    # < deg units in the contribution divides; 3 iterations, tiny vs SCALE
    assert SCALE * 0.999 < total <= SCALE


def test_empty_edges_raises(spark):
    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge set"):
        pagerank_fixedpoint(df)


def test_fast_path_matches_distributed(spark, monkeypatch):
    from data_model_spark.operators import pagerank as pr

    edges = [(i, (i * 11) % 60) for i in range(60) if i != (i * 11) % 60]
    edges += [(b, a) for a, b in edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = _ranks(pagerank_fixedpoint(df, iterations=3))
    monkeypatch.setattr(pr, "PR_SMALL_EDGES", 0)  # force distributed rounds
    slow = _ranks(pagerank_fixedpoint(df, iterations=3))
    assert fast == slow
