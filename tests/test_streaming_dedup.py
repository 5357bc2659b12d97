"""Streaming watermark-scoped dedup: drain equals batch DISTINCT."""

from pyspark.sql import functions as F

from data_model_spark.streaming.dedup import streaming_dedup_counts

EVENTS = "/root/testdata/sf0.001/events.parquet"


def batch_rollup(spark):
    return {
        r["event_type"]: (r["n"], r["sum_value"])
        for r in spark.read.parquet(EVENTS)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .collect()
    }


def as_map(df):
    return {r["event_type"]: (r["n"], r["sum_value"]) for r in df.collect()}


def test_duplicated_ingest_dedups_to_batch_distinct(spark):
    got = as_map(streaming_dedup_counts(spark, EVENTS, duplicate_input=True))
    assert got == batch_rollup(spark)


def test_single_ingest_passes_through(spark):
    got = as_map(streaming_dedup_counts(spark, EVENTS, duplicate_input=False))
    assert got == batch_rollup(spark)


def test_multipart_duplicated_ingest_dedups(spark, tmp_path):
    """Directory-shaped source: each copy's parts share one micro-batch,
    the duplicate copy arrives in a later one; result == batch rollup."""
    src = spark.read.parquet(EVENTS)
    pq = str(tmp_path / "events_dir.parquet")
    src.repartition(3).write.mode("overwrite").parquet(pq)
    got = as_map(streaming_dedup_counts(spark, pq, duplicate_input=True))
    assert got == batch_rollup(spark)
