"""Borůvka minimum spanning forest: closed-form graphs + Kruskal parity."""

from pyspark.sql import functions as F

from data_model_spark.operators.mst import (
    N_PTS,
    R_MST,
    _kruskal,
    boruvka_msf,
    fixture_edges,
    radius_graph_edges,
    range_points,
)


def _forest(spark, edges, parts=4):
    df = spark.createDataFrame(edges, "id_a long, id_b long, w long").repartition(
        parts
    )
    return sorted(
        (int(r.id_a), int(r.id_b), int(r.w)) for r in boruvka_msf(df).collect()
    )


def test_path_graph_keeps_every_edge(spark):
    # a path is its own MST
    edges = [(i, i + 1, 100 + i) for i in range(6)]
    assert _forest(spark, edges) == sorted(edges)


def test_cycle_drops_heaviest_edge(spark):
    edges = [(0, 1, 10), (1, 2, 11), (2, 3, 12), (0, 3, 99)]
    assert _forest(spark, edges) == [(0, 1, 10), (1, 2, 11), (2, 3, 12)]


def test_forest_over_two_components(spark):
    # two disjoint triangles -> two 2-edge trees, heaviest edge of each dropped
    t1 = [(0, 1, 1), (1, 2, 2), (0, 2, 3)]
    t2 = [(10, 11, 4), (11, 12, 5), (10, 12, 6)]
    assert _forest(spark, t1 + t2) == [
        (0, 1, 1),
        (1, 2, 2),
        (10, 11, 4),
        (11, 12, 5),
    ]


def test_single_edge_and_empty(spark):
    assert _forest(spark, [(5, 7, 42)]) == [(5, 7, 42)]
    empty = spark.createDataFrame([], "id_a long, id_b long, w long")
    assert boruvka_msf(empty).count() == 0


def test_fixture_matches_kruskal_exactly(spark):
    """The registered query's property: Borůvka over the radius graph
    produces the identical edge SET as sequential Kruskal (unique weights
    make the forest canonical)."""
    n = 400  # smaller field, same arithmetic — keeps the test fast
    edges = radius_graph_edges(range_points(spark, n), R_MST)
    got = sorted(
        (int(r.id_a), int(r.id_b), int(r.w)) for r in boruvka_msf(edges).collect()
    )
    want = sorted(_kruskal(fixture_edges(n, R_MST)))
    assert got == want
    # radius graph at this lag cap is connected enough to be a near-tree:
    # |forest| = n - #components
    n_comp = n - len(want)
    assert 1 <= n_comp < n


def test_weights_are_unique_by_construction(spark):
    edges = radius_graph_edges(range_points(spark, N_PTS), R_MST)
    total = edges.count()
    assert edges.select("w").distinct().count() == total
    assert total > N_PTS  # non-vacuous: denser than a tree
