"""Connected-components clustering: exactness vs a driver-side union-find."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators.components import (
    canonical_docs,
    connected_components,
)


def union_find(edges):
    """Reference components: comp id = min node id of the component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def run_cc(spark, edges, **kw):
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges] or [(0, 0)],
        "doc_a long, doc_b long",
    )
    if not edges:
        df = df.filter("doc_a < 0")
    out = connected_components(df, **kw)
    return {r["node"]: r["comp"] for r in out.collect()}


GRAPHS = {
    "chain": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "two_triangles_bridge": [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10)],
    "star": [(100, i) for i in range(1, 9)],
    "separate_pairs": [(1, 2), (5, 9), (20, 30)],
    "dup_and_reversed": [(2, 1), (1, 2), (2, 1), (3, 2), (7, 7), (4, 3)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_matches_union_find(spark, name):
    edges = GRAPHS[name]
    clean = [(a, b) for a, b in edges if a != b]
    assert run_cc(spark, edges) == union_find(clean)


def test_long_path_converges(spark):
    """128-node path: the worst diameter shape for label propagation;
    large-star/small-star must still converge within the O(log^2 n) budget."""
    edges = [(i, i + 1) for i in range(1, 128)]
    got = run_cc(spark, edges)
    assert got == {i: 1 for i in range(1, 129)}


def test_random_graphs_match_union_find(spark):
    rng = np.random.default_rng(7)
    for _ in range(3):
        n = int(rng.integers(20, 80))
        m = int(rng.integers(10, 120))
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)
        ]
        clean = [(a, b) for a, b in edges if a != b]
        assert run_cc(spark, edges) == union_find(clean)


def test_empty_edges(spark):
    assert run_cc(spark, []) == {}


def test_canonical_docs_keep_flags(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    comps = connected_components(
        spark.createDataFrame([(1, 3), (3, 5), (2, 6)], "doc_a long, doc_b long")
    )
    out = {r["doc_id"]: (r["kept_as"], r["keep"]) for r in canonical_docs(docs, comps).collect()}
    assert out == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (1, False),
        4: (4, True),
        5: (1, False),
        6: (2, False),
        7: (7, True),
    }


def test_non_convergence_raises(spark, monkeypatch):
    from data_model_spark.operators import components as C

    # force the distributed large/small-star path (the guard under test);
    # the single-task fast path has no iteration budget to exhaust
    monkeypatch.setattr(C, "CC_SMALL_EDGES", 0)
    df = spark.createDataFrame([(i, i + 1) for i in range(1, 40)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)


def test_small_fast_path_matches_distributed(spark, monkeypatch):
    from data_model_spark.operators import components as C

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 10), (5, 5), (20, 3)],
        "doc_a long, doc_b long",
    )
    fast = sorted(tuple(r) for r in connected_components(df).collect())
    monkeypatch.setattr(C, "CC_SMALL_EDGES", 0)
    dist = sorted(tuple(r) for r in connected_components(df).collect())
    assert fast == dist


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=0, max_size=50
    )
)
def test_property_matches_union_find(spark, edges):
    clean = [(a, b) for a, b in edges if a != b]
    assert run_cc(spark, edges) == union_find(clean)
