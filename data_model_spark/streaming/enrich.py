"""Stream-stream interval join (watermarked, bounded state).

The missing Structured Streaming operator class next to the windowed
aggregation (``windowed.py``), dedup (``dedup.py``) and session
(``sessions.py``) harnesses: TWO live streams joined on a key plus an
event-time range — the "view followed by a purchase within N hours"
enrichment every event pipeline runs.

Pattern:

    left  = readStream -> filter(view)     -> withWatermark(ts)
    right = readStream -> filter(purchase) -> withWatermark(ts)
    left.join(right, key AND right.ts BETWEEN left.ts AND left.ts + N)

The time-range predicate is what bounds the join state: Spark derives a
state watermark from it and evicts buffered left rows once the right
watermark passes ``left.ts + N`` (and vice versa), so a 10^12-event
ingest holds only the N-hour horizon per side in the state store —
an unconstrained stream-stream join would buffer both streams forever.

Drain-harness evidence: the input is staged as TWO time-split files
consumed with ``maxFilesPerTrigger=1``, so each source sees two
micro-batches (first half, then second half).  View/purchase matches
that span the split can only be produced if the first batch's unmatched
view rows genuinely survive in the join state until the second batch
arrives — which is the property under test; the drained result must
equal the batch interval join (the DuckDB oracle).  The split point is
the event-time median, and the watermark delay exceeds zero lateness in
the time-ordered staging, so no row is late-dropped and the equality is
exact.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_interval_join(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon_minutes: int = 120,
    watermark: str = "60 minutes",
    split_ts=None,
) -> DataFrame:
    """(user_id, view_id, purchase_id, delta_us) for every ``right_type``
    event within ``horizon_minutes`` after a ``left_type`` event of the
    same user; both sides consumed as watermarked streams."""
    batch = spark.read.parquet(events_path).select(
        "event_id", "ts", "user_id", "event_type"
    )
    staged = tempfile.mkdtemp(prefix="evt_join_")
    name = f"evt_join_{uuid.uuid4().hex[:8]}"
    try:
        # time-split staging: two files, strictly ordered mtimes -> each
        # source drains them as two event-time-ordered micro-batches
        # split point: event-time median by default; tests pass an
        # explicit split_ts placed INSIDE a known match so the
        # cross-micro-batch state carry-over is provably exercised
        mid = split_ts
        if mid is None:
            mid = batch.agg(
                F.expr("percentile_approx(ts, 0.5, 100000)").alias("m")
            ).collect()[0]["m"]
        import glob
        import time as _time

        now = _time.time()
        halves = (
            batch.filter(F.col("ts") <= F.lit(mid)),
            batch.filter(F.col("ts") > F.lit(mid)),
        )
        for i, half in enumerate(halves):
            tmp = os.path.join(staged, f"_tmp{i}")
            half.coalesce(1).write.parquet(tmp)
            (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
            dst = os.path.join(staged, f"part{i}.parquet")
            shutil.move(part, dst)
            shutil.rmtree(tmp)
            os.utime(dst, (now + 600 * i, now + 600 * i))

        schema = batch.schema

        def side(event_type: str, alias: str):
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(staged)
                .filter(F.col("event_type") == event_type)
                # source ts is TIMESTAMP_NTZ; watermarks need TIMESTAMP
                .withColumn("ts", F.col("ts").cast("timestamp"))
                .withWatermark("ts", watermark)
                .alias(alias)
            )

        v, p = side(left_type, "v"), side(right_type, "p")
        joined = v.join(
            p,
            (F.col("v.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("v.ts"))
            & (
                F.col("p.ts")
                <= F.col("v.ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
            ),
        ).select(
            F.col("v.user_id").alias("user_id"),
            F.col("v.event_id").alias("view_id"),
            F.col("p.event_id").alias("purchase_id"),
            (
                F.unix_micros(F.col("p.ts")) - F.unix_micros(F.col("v.ts"))
            ).alias("delta_us"),
        )
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(name)
        shutil.rmtree(staged, ignore_errors=True)
