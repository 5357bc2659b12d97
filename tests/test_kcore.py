"""k-core tests: fixpoint equality with a sequential peeler on random
graphs, a long-chain cascade that needs many rounds, the simultaneous-
removal semantics mid-cascade, and parallelism determinism."""

import numpy as np

from data_model_spark.operators.kcore import kcore_peel, kcore_reference


def _sym(edges):
    """Symmetrize an undirected edge list."""
    out = set()
    for a, b in edges:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


def _df(spark, edges):
    return spark.createDataFrame(_sym(edges), "src long, dst long")


def _collect(df):
    return {r.node: r.deg for r in df.collect()}


def test_matches_sequential_fixpoint_random(spark):
    rng = np.random.default_rng(14)
    edges = {
        (int(a), int(b))
        for a, b in rng.integers(0, 40, (200, 2))
        if a != b
    }
    for k in (2, 3, 4):
        got = _collect(kcore_peel(_df(spark, edges), k, rounds=40))
        assert got == kcore_reference(_sym(edges), k), k


def test_chain_cascades_one_round_per_node(spark):
    # path 0-1-2-...-9 hanging off a triangle(10,11,12)+anchor: 2-core
    # peeling eats the path one end-node per round -> needs ~10 rounds
    chain = [(i, i + 1) for i in range(9)]
    tri = [(9, 10), (10, 11), (11, 12), (12, 10)]
    edges = chain + tri
    df = _df(spark, edges)
    full = _collect(kcore_peel(df, 2, rounds=12))
    assert set(full) == {10, 11, 12}  # only the triangle survives
    # mid-cascade: after 3 rounds the chain has lost exactly its 3
    # outermost nodes (simultaneous-removal semantics, one per round —
    # node 0 first, then 1, then 2)
    part = _collect(kcore_peel(df, 2, rounds=3))
    assert set(part) == set(range(3, 13))


def test_residual_degrees_exact(spark):
    # 4-clique: every node survives k=3 with degree 3
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _collect(kcore_peel(_df(spark, edges), 3, rounds=5))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_everything_peels(spark):
    edges = [(0, 1), (1, 2)]
    assert kcore_peel(_df(spark, edges), 2, rounds=3).count() == 0


def test_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(3)
    edges = {
        (int(a), int(b))
        for a, b in rng.integers(0, 60, (400, 2))
        if a != b
    }
    df = _df(spark, edges)
    a = sorted(map(tuple, kcore_peel(df.repartition(1), 3, 6).collect()))
    b = sorted(map(tuple, kcore_peel(df.repartition(19), 3, 6).collect()))
    assert a == b and len(a) > 5
