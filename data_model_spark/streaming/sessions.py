"""Streaming sessionization: ``session_window`` + watermark, flush-drained.

The incremental twin of ``operators/sessions.py``: Spark's native session
window merges events within ``gap`` of each other per key, holding one
open window per (user, session) in the state store and finalizing it when
the watermark passes session end + gap.  In append mode a finalized
session is emitted exactly once — the production shape for a continuous
event ingest (state bounded by the watermark horizon).

Drain-oracle mechanics: append mode only EMITS a session once the
watermark has passed it, and the watermark only advances between
micro-batches — so draining a finite input would leave every session that
ends within the last watermark-delay of the input's max timestamp stuck
in state, never emitted.  The harness therefore stages a second input
file containing one FLUSH sentinel event far past the real data (and
forces file order by modification time, one file per trigger): the
sentinel advances the watermark past every real session, all of them
finalize and emit, and the sentinel's own session is filtered out of the
drained result by its reserved user_id.  This is the standard
"advance-the-watermark" flush used to close out event-time state, and it
makes the streaming result comparable to the batch gap-sessionization
oracle row-for-row.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FLUSH_USER = -1


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
    batch = spark.read.parquet(events_path)
    schema = batch.schema
    staged = tempfile.mkdtemp(prefix="evt_sessions_")
    name = f"evt_sessions_{uuid.uuid4().hex[:8]}"
    try:
        src = os.path.abspath(events_path)
        main = os.path.join(staged, "a_events.parquet")
        os.symlink(src, main)
        # flush sentinel: one event far beyond the real max event time
        # TWO sentinels, each a SINGLE top-level parquet file (the file
        # stream source does not pick up nested part-files of a directory
        # write) in its own strictly-later micro-batch: the watermark
        # computed from batch N only gates emission in batch N+1, so
        # sentinel 1 advances the watermark past every real session and
        # the following batches are where they actually emit.
        import pyarrow as pa
        import pyarrow.parquet as pq

        src_tbl = pq.read_table(src)
        max_us = pa.compute.max(src_tbl["ts"].cast(pa.int64())).as_py()
        now = time.time()
        os.utime(main, (now - 600, now - 600), follow_symlinks=False)
        for i in (1, 2):
            flush_us = max_us + gap_minutes * 4 * i * 60 * 1_000_000
            sentinel = pa.table(
                {
                    "event_id": pa.array([-i], pa.int64()),
                    "ts": pa.array([flush_us], pa.int64()).cast(
                        src_tbl.schema.field("ts").type
                    ),
                    "user_id": pa.array([FLUSH_USER], pa.int64()),
                    "event_type": pa.array(["flush"], pa.string()),
                    "value": pa.array([0.0], pa.float64()),
                    "props": pa.array(["{}"], pa.string()),
                },
                schema=src_tbl.schema,
            )
            flush_file = os.path.join(staged, f"flush{i}.parquet")
            pq.write_table(sentinel, flush_file)
            os.utime(flush_file, (now + 600 * i, now + 600 * i))

        sessions = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
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
        return (
            spark.table(name)
            .filter(F.col("user_id") != FLUSH_USER)
            .select("user_id", "t_start_us", "n_events", "sum_value")
        )
    finally:
        shutil.rmtree(staged, ignore_errors=True)
