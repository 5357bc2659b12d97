"""Leakage-free split: no duplicate cluster straddles a split boundary,
proportions track the hash cuts, assignment is corpus-deterministic."""

from pyspark.sql import functions as F

from data_model_spark.operators.components import connected_components
from data_model_spark.operators.dedup import jaccard_pairs
from data_model_spark.operators.splits import group_split, leakage_free_split

SF = "/root/testdata/sf0.01"


def test_no_cluster_straddles_splits(spark):
    out = leakage_free_split(spark, SF).cache()
    try:
        per_group = out.groupBy("group_key").agg(
            F.countDistinct("split").alias("n_splits"),
            F.count("*").alias("n_docs"),
        )
        assert per_group.filter(F.col("n_splits") > 1).count() == 0
        # non-vacuity: real multi-document clusters exist in the fixture
        assert per_group.filter(F.col("n_docs") > 1).count() >= 5
    finally:
        out.unpersist()


def test_split_proportions_and_totals(spark):
    out = leakage_free_split(spark, SF)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == 500
    # hash buckets are uniform-ish; train should dominate heavily
    assert counts.get("train", 0) / total > 0.8
    assert 0 < counts.get("valid", 0) + counts.get("test", 0) < 0.2 * total


def test_split_is_function_of_group_only(spark):
    """Two docs with the same group_key always share bucket and split."""
    from data_model_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    comps = connected_components(jaccard_pairs(docs, 0.3, n=3))
    out = group_split(docs, comps)
    distinct = out.select("group_key", "bucket", "split").distinct()
    assert distinct.groupBy("group_key").count().filter("count > 1").count() == 0


def test_leakage_audit_group_zero_naive_positive(spark):
    """The audit proves the guarantee AND its own non-vacuity: the group
    policy has zero straddling pairs, the naive per-doc policy leaks."""
    from data_model_spark.operators.split_audit import split_leakage_audit

    rows = {r.policy: r for r in split_leakage_audit(spark, SF).collect()}
    assert rows["group"].straddling_pairs == 0
    assert rows["group"].total_pairs > 0
    assert rows["naive"].straddling_pairs > 0
    assert rows["naive"].total_pairs == rows["group"].total_pairs


def test_fertility_exact_sums(spark):
    from pyspark.sql import functions as F

    from data_model_spark.operators.split_audit import tokenizer_fertility
    from data_model_spark.sources.tables import load_table

    out = {r.lang: r for r in tokenizer_fertility(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    direct = docs.agg(
        F.sum(F.length("text")).alias("chars"), F.count("*").alias("n")
    ).collect()[0]
    assert sum(r.chars for r in out.values()) == direct.chars
    for r in out.values():
        assert 0 < r.fertility < 1  # whitespace tokens are multi-char
