"""Streaming exact-dedup: watermark-scoped dropDuplicates over an ingest.

The streaming face of ``operators/dedup.py``'s exact dedup: a continuous
ingest re-delivers events (at-least-once sources, replayed partitions),
and the pipeline must emit each logical event once.  Pattern:

    readStream -> withWatermark(ts) -> dropDuplicates([key, ts]) -> sink

Including the event-time column in the dedup key is what bounds the
state store: Spark evicts dedup state older than the watermark, so a
10^12-event ingest holds only the watermark horizon in state, while
an unkeyed ``dropDuplicates([key])`` would grow forever.

The drain harness stages the input parquet TWICE (two symlinks in the
source directory), so the stream genuinely observes every row at least
twice and the deduplicated drain must equal the batch ``DISTINCT`` —
which makes the streaming operator oracle-checkable, exactly like
``streaming/windowed.py``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_dedup_counts(
    spark: SparkSession,
    events_path: str,
    watermark: str = "60 minutes",
    duplicate_input: bool = True,
) -> DataFrame:
    """Dedup a (duplicated) event stream, return per-type (n, sum_value).

    The dedup runs INSIDE the streaming query (append mode, watermarked
    state); the tiny per-type rollup of the drained result is batch-side
    presentation.
    """
    schema = spark.read.parquet(events_path).schema
    staged = tempfile.mkdtemp(prefix="evt_dedup_")
    name = f"evt_dedup_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.abspath(events_path)
        # stage_parquet handles both single-file and directory-shaped
        # parquet (the file stream source does not descend into a nested
        # Spark-written dataset directory).  Copy 1 is symlinked; copy 2
        # is a real copy with a forced later mtime so the duplicates
        # arrive in a strictly-later micro-batch (cross-batch dedup
        # state).  maxFilesPerTrigger = the per-copy file count keeps each
        # copy's parts in ONE batch — split parts would let the first
        # batch's watermark discard later parts' older rows as late data;
        # splitting between the copies is safe (batch-2 rows are all
        # duplicates of batch-1 rows by construction).
        from .staging import stage_parquet

        newest, n_files = stage_parquet(src, staged, prefix="copy1_")
        if duplicate_input:
            import time

            stage_parquet(
                src, staged, prefix="copy2_", copy=True,
                mtime=max(time.time(), newest) + 600,
            )
        deduped = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", n_files)  # one copy per batch:
            # duplicates arrive in a SEPARATE, later micro-batch, so the
            # dedup state provably carries across batches
            .parquet(staged)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .dropDuplicates(["event_id", "ts"])
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # detach from the memory sink + drop its temp view so repeated
        # calls don't accumulate sinks in the driver
        return (
            spark.table(name)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 6).alias("sum_value"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(staged, ignore_errors=True)
