"""Incremental dedup delta: equals the full recompute's delta slice."""

from pyspark.sql import functions as F

from data_model_spark.operators.dedup import jaccard_pairs, unpersist_intermediates
from data_model_spark.operators.dedup_delta import SPLIT, dedup_delta_pairs
from data_model_spark.sources.tables import load_table


def test_delta_equals_full_recompute_slice(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    delta = docs.filter(F.col("doc_id") >= SPLIT).select("doc_id")
    try:
        inc = sorted(map(tuple, dedup_delta_pairs(docs, delta).collect()))
        full = sorted(
            map(
                tuple,
                jaccard_pairs(docs, 0.5, 3)
                .filter(
                    (F.col("doc_a") >= SPLIT) | (F.col("doc_b") >= SPLIT)
                )
                .collect(),
            )
        )
    finally:
        unpersist_intermediates()
    assert inc == full and len(inc) > 0
    # the incremental plan never pairs two old documents
    assert all(a >= SPLIT or b >= SPLIT for a, b, _ in inc)


def test_no_old_old_pairs_in_plan(spark):
    # the old-x-old pair space is excluded STRUCTURALLY: with an empty
    # delta the result is empty without scanning any pair
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    empty = docs.filter("doc_id < 0").select("doc_id")
    assert dedup_delta_pairs(docs, empty).count() == 0
