"""Watermarked windowed streaming (streaming/windowed.py) + late-data drop."""

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from data_model_spark.streaming.windowed import windowed_event_counts

SF = "/root/testdata/sf0.001"


class TestDrainEqualsBatch:
    def test_availablenow_drain_equals_batch_windows(self, spark):
        got = {
            (str(r.window_start), r.event_type, r.n)
            for r in windowed_event_counts(spark, f"{SF}/events.parquet").collect()
        }
        exp = {
            (str(r.w), r.event_type, r.n)
            for r in spark.read.parquet(f"{SF}/events.parquet")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
            .agg(F.count("*").alias("n"))
            .select(F.col("win.start").alias("w"), "event_type", "n")
            .collect()
        }
        assert got == exp and len(got) > 0


class TestWatermarkDropsLateRows:
    def test_late_row_beyond_watermark_is_dropped(self, spark, tmp_path):
        """Four micro-batches (maxFilesPerTrigger=1): the watermark passes
        window A's end in batch 2, so A is finalized/evicted and emitted
        with its on-time count; the late row for A arriving in batch 3 is
        DROPPED (numRowsDroppedByWatermark) — the bounded-state contract a
        continuous ingest depends on.  Late rows that arrive while a
        window's state is still live are merged, per Spark semantics, so
        the drop requires the state to have been evicted first."""
        import glob
        import os
        import time

        import pyarrow.parquet as pq

        t0 = dt.datetime(2024, 3, 1, 10, 0, 0)

        def rows(*offsets_min):
            return [(t0 + dt.timedelta(minutes=m), "e", 1.0) for m in offsets_min]

        d = str(tmp_path / "events")
        # batch content is identified by row count; mtimes pin the order
        batches = [(0, 5, 7), (59,), (40, 45), (2, 90, 91, 92)]
        for b in batches:
            spark.createDataFrame(
                rows(*b), "ts timestamp, event_type string, value double"
            ).coalesce(1).write.mode("append").parquet(d)
        now = time.time()
        order = {len(b): i for i, b in enumerate(batches)}
        for part in glob.glob(f"{d}/part-*.parquet"):
            i = order[pq.ParquetFile(part).metadata.num_rows]
            os.utime(part, (now - 50 + 10 * i, now - 50 + 10 * i))
        # timeline: batch0 {10:00,10:05,10:07} builds window A; batch1
        # {10:59} raises the max event time; batch2 runs at watermark 10:49
        # > A's end -> A emitted n=3, state evicted; batch3 carries the
        # LATE 10:02 row (dropped) + on-time 11:30+ rows

        schema = spark.read.parquet(d).schema
        name = f"late_{uuid.uuid4().hex[:8]}"
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        emitted = {str(r.ws): r.n for r in spark.table(name).collect()}
        # window A emitted exactly once with the ON-TIME count only
        assert emitted.get("2024-03-01 10:00:00") == 3, emitted
        dropped = sum(
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
        )
        assert dropped == 1, dropped
