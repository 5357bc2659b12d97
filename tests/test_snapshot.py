"""Snapshot diff: direct-diff equality, pruning efficiency, edge cases."""

import pytest
from pyspark.sql import functions as F

from data_model_spark.operators.snapshot import _snap_b, snapshot_diff

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def _direct(spark):
    a = _docs(spark).select("doc_id", F.md5("text").alias("fp"))
    b = _snap_b(spark, SF).select(
        F.col("doc_id").alias("id_b"), F.md5("text").alias("fp_b")
    )
    j = a.join(b, a["doc_id"] == b["id_b"], "full_outer")
    out = j.select(
        F.coalesce("doc_id", "id_b").alias("id"),
        F.when(F.col("doc_id").isNull(), "added")
        .when(F.col("id_b").isNull(), "removed")
        .when(F.col("fp") != F.col("fp_b"), "changed")
        .alias("status"),
    ).filter(F.col("status").isNotNull())
    return {(int(r.id), r.status) for r in out.collect()}


@pytest.mark.parametrize("range_size", [1, 16, 64, 10**9])
def test_matches_direct_diff_any_range_size(spark, range_size):
    got = {
        (int(r.id), r.status)
        for r in snapshot_diff(
            _docs(spark), _snap_b(spark, SF), "doc_id", "text", range_size
        ).collect()
    }
    want = _direct(spark)
    assert got == want
    assert {s for _, s in want} == {"added", "removed", "changed"}


def test_identical_snapshots_empty(spark):
    d = _docs(spark)
    assert snapshot_diff(d, d, "doc_id", "text").count() == 0


def test_pruning_skips_clean_ranges(spark):
    # mutate ONE row: with range_size=8 only ~1 of n/8 ranges (plus the
    # added-ids range) may go dirty — the detail join input must shrink
    from data_model_spark.operators.dedup import md5_60

    d = _docs(spark)
    b = d.select(
        "doc_id",
        F.when(F.col("doc_id") == 42, F.lit("mutated!")).otherwise(
            F.col("text")
        ).alias("text"),
    )
    got = snapshot_diff(d, b, "doc_id", "text", range_size=8).collect()
    assert {(int(r.id), r.status) for r in got} == {(42, "changed")}
