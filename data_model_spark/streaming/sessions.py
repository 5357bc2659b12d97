"""Streaming sessionization: ``session_window`` + watermark, flush-drained.

The incremental twin of ``operators/sessions.py``: Spark's native session
window merges events at most ``gap`` apart per key (empirically, windows
that merely TOUCH also merge — an event exactly ``gap`` after the
previous one stays in the same session, matching the batch formulation's
``diff > gap`` break rule; tests/test_sessions.py pins this boundary),
holding one open window per (user, session) in the state store and
finalizing it when the watermark passes session end + gap.  In append
mode a finalized session is emitted exactly once — the production shape
for a continuous event ingest (state bounded by the watermark horizon).

Drain-oracle mechanics: append mode only EMITS a session once the
watermark has passed it, and the watermark only advances between
micro-batches — so draining a finite input would leave every session
that ends within the last watermark-delay of the input's max timestamp
stuck in state, never emitted.  The harness therefore stages flush
sentinel events far past the real data as strictly-later micro-batches:
the first sentinel advances the watermark past every real session, the
batches after it are where those sessions actually emit, and the
sentinels' own sessions are filtered out of the drained result by their
reserved user_id.  This is the standard "advance-the-watermark" flush
used to close out event-time state, and it makes the streaming result
comparable to the batch gap-sessionization oracle row-for-row.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .staging import stage_parquet

FLUSH_USER = -1


def _write_flush_sentinels(
    src: str, staged: str, gap_minutes: int, data_mtime: float
) -> None:
    """Two single-file parquet sentinels, each a strictly-later micro-batch.

    Two because the watermark computed from batch N only gates emission in
    batch N+1: sentinel 1 advances the watermark past every real session,
    and the batches after it (sentinel 2 and/or the trailing no-data
    batch) are where those sessions actually emit.  Single top-level
    files because the file stream source does not pick up nested
    part-files of a directory-shaped parquet write.  Sentinel mtimes are
    set after BOTH now and the staged data's real target mtimes —
    ``lastModified()`` follows symlinks, so backdating the data links
    would be a no-op.
    """
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts_col = pq.read_table(src, columns=["ts"])["ts"]
    if len(ts_col) == 0:
        return  # nothing to flush: no sentinels, the drain is just empty
    # Normalize the sentinel's ts to MICROSECOND precision regardless of how
    # the source was written (plain timestamp[us], or Spark's INT96 which
    # pyarrow surfaces as timestamp[ns] — Spark cannot read back INT64
    # nanosecond timestamps, so ns must not leak into the sentinel file);
    # keep the source's tz-ness so NTZ sources stay NTZ.
    tz = getattr(ts_col.type, "tz", None)
    ts_us = pa.timestamp("us", tz=tz)
    max_us = pa.compute.max(ts_col.cast(pa.timestamp("us", tz=tz)).cast(pa.int64())).as_py()
    epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc if tz else None)
    base = max(time.time(), data_mtime)
    for i in (1, 2):
        flush_dt = epoch + dt.timedelta(
            microseconds=max_us + gap_minutes * 4 * i * 60 * 1_000_000
        )
        sentinel = pa.table(
            {
                "event_id": pa.array([-i], pa.int64()),
                "ts": pa.array([flush_dt], type=ts_us),
                "user_id": pa.array([FLUSH_USER], pa.int64()),
                "event_type": pa.array(["flush"], pa.string()),
                "value": pa.array([0.0], pa.float64()),
                "props": pa.array(["{}"], pa.string()),
            }
        )
        flush_file = os.path.join(staged, f"zz_flush{i}.parquet")
        pq.write_table(sentinel, flush_file)
        os.utime(flush_file, (base + 600 * i, base + 600 * i))


def streaming_sessions(
    spark: SparkSession,
    events_path: str,
    gap_minutes: int = 360,
    watermark: str = "1 minute",
) -> DataFrame:
    """Drained per-(user, session-window) rollup matching batch sessions.

    Output: (user_id, t_start_us, n_events, sum_value) — session start
    identifies the session (session_idx is an ordinal the incremental
    operator does not know globally).
    """
    schema = spark.read.parquet(events_path).schema
    staged = tempfile.mkdtemp(prefix="evt_sessions_")
    name = f"evt_sessions_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.abspath(events_path)
        data_mtime, n_files = stage_parquet(src, staged, prefix="a")
        _write_flush_sentinels(src, staged, gap_minutes, data_mtime)

        sessions = (
            spark.readStream.schema(schema)
            # ALL data part-files must share the first micro-batch (the
            # sentinels, dated later, form their own) — split across
            # batches, the first batch's watermark would discard later
            # parts' older rows as late data
            .option("maxFilesPerTrigger", n_files)
            .parquet(staged)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", watermark)
            .groupBy(
                F.session_window("ts", f"{gap_minutes} minutes").alias("sw"),
                "user_id",
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 6).alias("sum_value"),
                F.min(F.unix_micros(F.col("ts"))).alias("t_start_us"),
            )
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # detach the result from the memory sink, then drop the sink's temp
        # view so repeated calls don't accumulate sinks in the driver
        return (
            spark.table(name)
            .filter(F.col("user_id") != FLUSH_USER)
            .select("user_id", "t_start_us", "n_events", "sum_value")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(staged, ignore_errors=True)
