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

    Units are per-(band, level) — the reference's band-by-band write loop
    (geozarr.py:974-1183) with skip-existing-valid-band resume semantics
    (geozarr.py:1044-1056) — returned as one queryable row per unit.
    """
    from . import tiling
    from .resume import ResumableTileWrite

    base = tempfile.mkdtemp(prefix="resume_q_")
    merged = None
    try:
        images = generate_images_df(spark, _N_IMG)
        tiles = tiling.build_tiles(images, min_dimension=64, repartition=False)
        merged = tiling.merge_tiles(tiles).persist()
        units = sorted(
            tuple(r) for r in merged.select("var", "level").distinct().collect()
        )
        sink = ResumableTileWrite(
            f"{base}/tiles", f"{base}/ckpt", unit_cols=("var", "level")
        )
        r1 = sink.run(spark, merged, units)
        r2 = sink.run(spark, merged, units)
        n_rows = {
            (r.var, r.level): r.n
            for r in sink.table.read(spark)
            .groupBy("var", "level")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        rows = [
            (
                u[0],
                int(u[1]),
                u in r1["written"],
                u in r2["skipped"],
                int(n_rows.get(u, 0)),
            )
            for u in units
        ]
        out = local_df(
            spark,
            rows,
            "var string, level int, run1_written boolean, run2_skipped boolean, n_tiles int",
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


_N_IMG_MB = 26  # two full band cycles — every band kernel twice


def _multiband_oracle() -> str:
    """Per-(band, level) pyramid metrics re-derived WITHOUT the tile cut.

    For each generated image the builder regenerates the decoded pixels and
    computes each level array by DIRECT downsample dispatch (no /2 cascade,
    no tile grid), inlining per-(image, level) totals as VALUES; the SQL
    then re-derives the intersecting-tile COUNT from scene geometry with
    floor arithmetic and aggregates.  Equality therefore proves: cascade ==
    direct kernels, the tile cut conserves pixels/sums/extrema, and the
    distributed per-band aggregation — none of which the oracle replays.
    """
    return _pyramid_sql(
        _pyramid_vals((f"img_{i:012d}", i) for i in range(_N_IMG_MB))
    )


def _pyramid_vals(ids_and_indices) -> list[str]:
    """Per-(image, level) VALUES rows for pyramid-metric oracles: direct
    downsample dispatch from regenerated pixels, no tile grid involved."""
    from ..codecs import decode_image, encode_image
    from ..functions import gridlib
    from ..sources import images as img_src
    from .downsample import downsample

    vals = []
    for image_id, i in ids_and_indices:
        w, h = img_src.image_dims(i)
        var = img_src.band_for(i)
        fmt = img_src.image_fmt(i)
        pixels = img_src.synth_pixels(image_id, w, h)
        decoded = (
            decode_image(encode_image(pixels, fmt), fmt, w, h)
            if fmt == "jpeg"
            else pixels
        )
        ax, ay = img_src.scene_anchor(i)
        top = ay + h * img_src.PIXEL_SIZE_M
        for lv in gridlib.overview_levels(w, h, min_dimension=64):
            level, lw, lh = lv["level"], lv["width"], lv["height"]
            arr = (
                decoded
                if level == 0
                else downsample(decoded, lh, lw, var)
            ).astype("float64")
            vals.append(
                f"('{var}', {level}, {ax!r}, {top!r}, {lw}, {lh}, "
                f"{10.0 * 2 ** level!r}, {float(arr.sum())!r}, "
                f"{float(arr.min())!r}, {float(arr.max())!r})"
            )
    return vals


def _pyramid_sql(vals: list[str]) -> str:
    return f"""
WITH v(var, level, ax, top, lw, lh, px, sumv, minv, maxv) AS (VALUES
  {", ".join(vals)}),
g AS (
  SELECT *, 256.0 * px AS tm FROM v)
SELECT var, level,
       CAST(SUM((FLOOR((ax + lw * px - 1e-9) / tm) - FLOOR(ax / tm) + 1)
              * (FLOOR((top - 1e-9) / tm) - FLOOR((top - lh * px + 1e-9) / tm) + 1))
            AS BIGINT) AS n_tiles,
       CAST(SUM(lw * lh) AS BIGINT) AS n_pixels,
       ROUND(SUM(sumv), 3) AS sum_value,
       MIN(minv) AS min_value,
       MAX(maxv) AS max_value
FROM g GROUP BY var, level"""


@register("flagship_multiband", _multiband_oracle)
def flagship_multiband(spark, sf_dir):
    """Flagship pyramid over the full band cycle: per-(band, level) metrics
    of the tile fragments — band-by-band dispatch (A10) inside the cut."""
    from . import tiling

    images = generate_images_df(spark, _N_IMG_MB)
    frags = tiling.build_tiles(images, min_dimension=64, repartition=False)
    return frags.groupBy("var", "level").agg(
        F.count("*").alias("n_tiles"),
        F.sum("px_cnt").alias("n_pixels"),
        F.round(F.sum("px_sum"), 3).alias("sum_value"),
        F.min("px_min").alias("min_value"),
        F.max("px_max").alias("max_value"),
    )


_N_IMG_TC = 24
_TC_REV_EVERY = 3  # every 3rd scene gets a revision


def _tc_winner_ids():
    from ..sources.images import revision_id

    return [
        (revision_id(i, 1 if i % _TC_REV_EVERY == 0 else None), i)
        for i in range(_N_IMG_TC)
    ]


def _composite_oracle() -> str:
    """Pyramid metrics of the WINNING revision per scene (direct dispatch,
    no tile cut, no catalog logic — the engine must independently resolve
    the same winners through its revision window)."""
    return _pyramid_sql(_pyramid_vals(_tc_winner_ids()))


@register("temporal_composite", _composite_oracle)
def temporal_composite(spark, sf_dir):
    """Reprocessing-campaign composite: resolve scene revisions, then cut.

    The catalog holds the original 24 scenes PLUS revision-1 rows for every
    3rd scene (same footprint, new pixel content — sources.images.
    generate_revision_df).  ``tiling.latest_revision`` keeps exactly one
    row per scene (numeric-revision top-1 window), so downstream px_sum /
    px_cnt metadata is composite-exact instead of double-counting
    superseded pixels.  The oracle inlines per-level totals of the known
    winners only; matching proves the engine picked the same winners and
    their (revision-specific) pixels flowed through the cut untouched.
    """
    from ..sources.images import generate_images_df, generate_revision_df
    from . import tiling

    base = generate_images_df(spark, _N_IMG_TC)
    revs = generate_revision_df(
        spark, [i for i in range(_N_IMG_TC) if i % _TC_REV_EVERY == 0], rev=1
    )
    latest = tiling.latest_revision(base.unionByName(revs))
    frags = tiling.build_tiles(latest, min_dimension=64, repartition=False)
    return frags.groupBy("var", "level").agg(
        F.count("*").alias("n_tiles"),
        F.sum("px_cnt").alias("n_pixels"),
        F.round(F.sum("px_sum"), 3).alias("sum_value"),
        F.min("px_min").alias("min_value"),
        F.max("px_max").alias("max_value"),
    )


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


_EVT_DEDUP_ORACLE = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY event_type"""


@register("streaming_dedup", _EVT_DEDUP_ORACLE)
def streaming_dedup(spark, sf_dir):
    """Watermark-scoped streaming exact-dedup of a duplicated ingest.

    The events parquet is staged TWICE into the stream source (separate
    micro-batches: maxFilesPerTrigger equals the per-copy file count, so
    each whole copy lands in its own batch), so every event arrives at
    least twice; dropDuplicates([event_id, ts]) under a 60-min watermark
    must reduce the drain back to the batch DISTINCT — the per-type
    rollup therefore equals the plain batch aggregation (the oracle).
    Keying the dedup state by the event-time column is what lets the
    watermark evict it, keeping a continuous ingest's state bounded.
    """
    import os

    from ..streaming.dedup import streaming_dedup_counts

    return streaming_dedup_counts(spark, os.path.join(sf_dir, "events.parquet"))
