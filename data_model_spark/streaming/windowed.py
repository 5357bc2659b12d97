"""Watermarked windowed streaming aggregation over the events table.

The late-data pattern of SURVEY.md §2.9: ``readStream`` -> event-time
watermark -> tumbling-window aggregate -> sink.  Run under
``Trigger.AvailableNow`` the stream drains the current input exactly once
and stops, so the result equals the batch window aggregation — which makes
the operator ORACLE-CHECKABLE (DuckDB ``time_bucket`` twin) while the
production path keeps full streaming semantics: on a live cluster the same
query runs unmodified with a processing-time trigger, the watermark bounds
state (windows older than watermark are finalized and dropped from the
state store), and late rows beyond the watermark are discarded instead of
growing state forever — the property that keeps a continuous 10^12-event
ingest bounded.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    output_mode: str = "complete",
) -> DataFrame:
    """Tumbling-window (count, sum) per event type via a real streaming query.

    Returns the drained result as a batch DataFrame (memory sink).
    ``events_path`` may be a single parquet file; the file streaming source
    requires a directory, so a file path is staged via a symlinked temp dir.

    ``output_mode``: "complete" (default) is the DRAIN-ORACLE mode — with
    Trigger.AvailableNow the result equals the batch window aggregation; in
    complete mode the watermark does NOT evict state, so this mode is for
    bounded drains only.  A continuous deployment passes "update" or
    "append", where the watermark finalizes and drops expired windows and
    discards late rows — the bounded-state behavior proven in
    tests/test_streaming_windows.py.
    """
    schema = spark.read.parquet(events_path).schema
    staged = None
    name = f"evt_windows_{uuid.uuid4().hex[:8]}"
    try:
        if os.path.isfile(events_path):
            staged = tempfile.mkdtemp(prefix="evt_stream_")
            os.symlink(os.path.abspath(events_path),
                       os.path.join(staged, os.path.basename(events_path)))
            events_path = staged
        stream = (
            spark.readStream.schema(schema)
            .parquet(events_path)
            # parquet reads NTZ; watermarks require TIMESTAMP (session TZ =
            # UTC, so the instant is unchanged)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 6).alias("sum_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n",
                "sum_value",
            )
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # detach the result from the memory sink, then drop the sink's temp
        # view so repeated calls don't accumulate sinks in the driver
        out = spark.table(name).localCheckpoint(eager=True)
        return out
    finally:
        spark.catalog.dropTempView(name)
        if staged:
            shutil.rmtree(staged, ignore_errors=True)
