"""Pipeline-level registered queries: resumable write + streaming drain.

These exercise the engine's execution semantics (idempotent checkpointed
writes, Trigger.AvailableNow streaming) end-to-end as driver-checkable
queries. They are rows-only (side-effecting pipelines over the generated
image table — not expressible as a DuckDB SELECT); their exactness is
covered by tests/test_resume.py and tests/test_streaming_multimodal.py.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from ..sources.images import generate_images_df
from ..sources.tables import local_df
from .registry import register

_N_IMG = 32


@register("resume_tile_write", None)
def resume_tile_write(spark, sf_dir):
    """Run the checkpointed tile sink twice; prove run 2 skips every unit.

    Returns one row per pyramid level with the write/skip outcome of both
    runs — the reference's skip-existing-valid-band resume semantics
    (geozarr.py:1044-1056) as a queryable result.
    """
    from . import tiling
    from .resume import ResumableTileWrite

    base = tempfile.mkdtemp(prefix="resume_q_")
    merged = None
    try:
        images = generate_images_df(spark, _N_IMG)
        tiles = tiling.build_tiles(images, min_dimension=64, repartition=False)
        merged = tiling.merge_tiles(tiles).persist()
        levels = sorted(r.level for r in merged.select("level").distinct().collect())
        sink = ResumableTileWrite(f"{base}/tiles", f"{base}/ckpt")
        r1 = sink.run(spark, merged, levels)
        r2 = sink.run(spark, merged, levels)
        n_rows = {
            r.level: r.n
            for r in sink.table.read(spark).groupBy("level").agg(F.count("*").alias("n")).collect()
        }
        rows = [
            (
                int(lv),
                lv in r1["written"],
                lv in r2["skipped"],
                int(n_rows.get(lv, 0)),
            )
            for lv in levels
        ]
        out = local_df(
            spark,
            rows,
            "level int, run1_written boolean, run2_skipped boolean, n_tiles int",
        )
        return out
    finally:
        if merged is not None:
            merged.unpersist()
        shutil.rmtree(base, ignore_errors=True)


@register("streaming_tiles", None)
def streaming_tiles(spark, sf_dir):
    """Drain the image table through Trigger.AvailableNow into tiles.

    Structured-Streaming twin of the batch pipeline: per-level fragment
    counts of the streamed tile table (same numbers the batch path yields).
    """
    from ..streaming.availablenow import stream_tiles_available_now

    base = tempfile.mkdtemp(prefix="stream_q_")
    try:
        generate_images_df(spark, _N_IMG).write.parquet(f"{base}/images")
        q = stream_tiles_available_now(
            spark, f"{base}/images", f"{base}/tiles", f"{base}/ckpt"
        )
        q.awaitTermination()
        rows = (
            spark.read.parquet(f"{base}/tiles")
            .groupBy("level")
            .agg(F.count("*").alias("n_fragments"))
            .orderBy("level")
            .collect()
        )
        # local relation: self-contained after the temp dir is removed
        return local_df(
            spark,
            [(r.level, r.n_fragments) for r in rows],
            "level int, n_fragments long",
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


_EVT_WINDOW_ORACLE = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2"""


@register("streaming_event_windows", _EVT_WINDOW_ORACLE)
def streaming_event_windows(spark, sf_dir):
    """Watermarked tumbling-window aggregation as a REAL streaming query.

    readStream over the events parquet -> 30-min event-time watermark ->
    10-min windows -> memory sink under Trigger.AvailableNow.  Draining the
    full input in one trigger makes the result equal the batch window
    aggregation, so the streaming operator itself is oracle-checked
    (DuckDB time_bucket twin); a continuous deployment runs the same query
    in update/append mode where the watermark bounds the state store.
    """
    import os

    from ..streaming.windowed import windowed_event_counts

    return windowed_event_counts(spark, os.path.join(sf_dir, "events.parquet"))
