"""LPA: deterministic vote semantics on crafted graphs + invariance."""

from data_model_spark.operators.lpa import lpa_communities


def _edges(spark, pairs):
    sym = list(pairs) + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def test_two_cliques_converge_to_min_labels(spark):
    # two 4-cliques bridged by one edge: each clique adopts its min id
    k1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    k2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    out = dict(lpa_communities(_edges(spark, k1 + k2 + [(3, 10)])).collect())
    assert all(out[n] == 0 for n in range(3))
    assert all(out[n] == 10 for n in range(11, 14))


def test_tie_breaks_to_smallest_label(spark):
    # node 2 sees labels {0, 1} with equal counts -> adopts 0 in round 1
    out = dict(lpa_communities(_edges(spark, [(0, 2), (1, 2)]), rounds=1).collect())
    assert out[2] == 0


def test_parallelism_invariant(spark, sf_dir):
    from data_model_spark.operators.kcore import _sparse_trade_edges

    e = _sparse_trade_edges(spark, sf_dir)
    a = sorted(map(tuple, lpa_communities(e.repartition(1)).collect()))
    b = sorted(map(tuple, lpa_communities(e.repartition(9)).collect()))
    assert a == b and len(a) > 0


def test_fast_path_matches_distributed(spark, sf_dir, monkeypatch):
    from data_model_spark.operators import lpa as lmod
    from data_model_spark.operators.kcore import _sparse_trade_edges

    e = _sparse_trade_edges(spark, sf_dir)
    fast = sorted(map(tuple, lpa_communities(e).collect()))
    monkeypatch.setattr(lmod, "LPA_SMALL_EDGES", 0)  # force distributed
    slow = sorted(map(tuple, lpa_communities(e).collect()))
    assert fast == slow and len(fast) > 0
