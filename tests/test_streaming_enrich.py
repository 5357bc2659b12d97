"""Stream-stream interval join: batch equality + cross-batch state proof."""

import pytest
from pyspark.sql import functions as F

from data_model_spark.streaming.enrich import stream_interval_join

SF = "/root/testdata/sf0.001"
EVENTS = f"{SF}/events.parquet"


@pytest.fixture(scope="module")
def drained(spark):
    return stream_interval_join(spark, EVENTS).toPandas()


def _batch_join(spark, horizon_minutes=120):
    e = spark.read.parquet(EVENTS).withColumn("ts", F.col("ts").cast("timestamp"))
    v = e.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return (
        v.join(
            p,
            (v["user_id"] == p["p_user"])
            & (p["p_ts"] >= v["v_ts"])
            & (
                p["p_ts"]
                <= v["v_ts"] + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
            ),
        )
        .select(
            "user_id",
            "view_id",
            "purchase_id",
            (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("delta_us"),
        )
        .toPandas()
    )


def _key(pdf):
    return {
        (int(r.user_id), int(r.view_id), int(r.purchase_id), int(r.delta_us))
        for r in pdf.itertuples(index=False)
    }


def test_streaming_equals_batch(spark, drained):
    want = _key(_batch_join(spark))
    assert _key(drained) == want
    assert len(want) > 0


def test_matches_span_the_microbatch_split(spark):
    # place the split INSIDE a known match (at the view's timestamp): the
    # view lands in micro-batch 1, its purchase in micro-batch 2, so the
    # pair can only appear if join state survived between triggers
    batch = _batch_join(spark)
    target = batch.loc[batch["delta_us"] > 0].sort_values("delta_us").iloc[-1]
    e = spark.read.parquet(EVENTS)
    split = e.filter(F.col("event_id") == int(target.view_id)).collect()[0]["ts"]
    got = stream_interval_join(spark, EVENTS, split_ts=split).toPandas()
    assert _key(got) == _key(batch)  # still exactly the batch join
    spanning = got[
        (got.view_id == int(target.view_id))
        & (got.purchase_id == int(target.purchase_id))
    ]
    assert len(spanning) == 1, "cross-batch match missing from the drain"


def test_delta_within_horizon(drained):
    assert (drained["delta_us"] >= 0).all()
    assert (drained["delta_us"] <= 120 * 60 * 1_000_000).all()
