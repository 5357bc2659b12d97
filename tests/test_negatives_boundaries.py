"""Negative sampling + range boundaries: contracts and determinism."""

from pyspark.sql import functions as F

from data_model_spark.operators.boundaries import B, range_boundaries
from data_model_spark.operators.kcore import _sparse_trade_edges
from data_model_spark.operators.negatives import negative_edges
from data_model_spark.sources.tables import load_table


def test_negatives_are_true_non_edges_and_deterministic(spark, sf_dir):
    edges = _sparse_trade_edges(spark, sf_dir)
    neg = negative_edges(edges)
    # no sampled pair is a real edge, no self pairs
    bad = neg.join(
        edges.withColumnRenamed("dst", "dst_neg"), ["src", "dst_neg"], "inner"
    )
    assert bad.count() == 0
    assert neg.filter("src = dst_neg").count() == 0
    a = sorted(map(tuple, neg.collect()))
    b = sorted(map(tuple, negative_edges(edges.repartition(7)).collect()))
    assert a == b and len(a) > 0
    # partners are valid nodes of the same edge set
    nodes = {r.node for r in edges.select(F.col("src").alias("node")).distinct().collect()}
    assert all(d in nodes for _, d, _ in a)


def test_boundaries_cover_and_are_monotone(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = range_boundaries(docs).orderBy("bucket").toPandas()
    assert list(out.bucket) == list(range(1, B + 1))
    assert out.n_rows.sum() == docs.count()
    n = out.n_rows.sum()
    base, extra = divmod(int(n), B)
    assert list(out.n_rows) == [base + (1 if i < extra else 0) for i in range(B)]
    # split points are non-decreasing and buckets nest inside them
    for i in range(len(out) - 1):
        assert out.hi[i] <= out.lo[i + 1] or out.hi[i] <= out.hi[i + 1]
