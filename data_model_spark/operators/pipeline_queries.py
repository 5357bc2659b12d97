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


def _scene_level_arrays(i: int, rev: int | None = None):
    """(level -> (array, ax, top_m, lw, lh)) for scene ``i``, regenerated
    through the codec roundtrip + DIRECT downsample dispatch — the same
    tile-grid-free path as ``_pyramid_vals``."""
    from ..codecs import decode_image, encode_image
    from ..functions import gridlib
    from ..sources import images as img_src
    from .downsample import downsample

    image_id = img_src.revision_id(i, rev)
    w, h = img_src.image_dims(i)
    fmt = img_src.image_fmt(i)
    pixels = img_src.synth_pixels(image_id, w, h)
    decoded = (
        decode_image(encode_image(pixels, fmt), fmt, w, h)
        if fmt == "jpeg"
        else pixels
    )
    ax, ay = img_src.scene_anchor(i)
    top = ay + h * img_src.PIXEL_SIZE_M
    out = {}
    for lv in gridlib.overview_levels(w, h, min_dimension=64):
        level, lw, lh = lv["level"], lv["width"], lv["height"]
        arr = decoded if level == 0 else downsample(decoded, lh, lw, img_src.band_for(i))
        out[level] = (arr, ax, top, lw, lh)
    return out


_N_IMG_NDI = 64  # full band-cycle x scene-dim grid: three b03/b04 overlap tiles
_NDI_PAIRS = (("b03", "b04"), ("b07", "b08"))


def _ndi_oracle() -> str:
    """Per-(pair, scene-pair, level) NDI stats on footprint intersections,
    computed WITHOUT the tile grid (direct slice arithmetic on regenerated
    level arrays); the SQL aggregates per (pair, level).  Equality proves
    the co-keyed tile join finds exactly the cross-band overlaps, the
    canvas nodata mask, and the per-pixel float index end-to-end."""
    import numpy as np

    from ..sources import images as img_src

    vals = []
    by_band: dict[str, list[int]] = {}
    for i in range(_N_IMG_NDI):
        by_band.setdefault(img_src.band_for(i), []).append(i)
    for va, vb in _NDI_PAIRS:
        for ia in by_band.get(va, []):
            la = _scene_level_arrays(ia)
            for ib in by_band.get(vb, []):
                lb = _scene_level_arrays(ib)
                for level in sorted(set(la) & set(lb)):
                    arr_a, ax_a, top_a, lw_a, lh_a = la[level]
                    arr_b, ax_b, top_b, lw_b, lh_b = lb[level]
                    px = img_src.PIXEL_SIZE_M * (2**level)
                    x0 = max(ax_a, ax_b)
                    x1 = min(ax_a + lw_a * px, ax_b + lw_b * px)
                    y1 = min(top_a, top_b)
                    y0 = max(top_a - lh_a * px, top_b - lh_b * px)
                    if x1 <= x0 or y1 <= y0:
                        continue
                    sa = arr_a[
                        round((top_a - y1) / px) : round((top_a - y0) / px),
                        round((x0 - ax_a) / px) : round((x1 - ax_a) / px),
                    ]
                    sb = arr_b[
                        round((top_b - y1) / px) : round((top_b - y0) / px),
                        round((x0 - ax_b) / px) : round((x1 - ax_b) / px),
                    ]
                    mask = (sa > 0) & (sb > 0)
                    if not mask.any():
                        continue
                    af = sa[mask].astype(np.float64)
                    bf = sb[mask].astype(np.float64)
                    ndi = (af - bf) / (af + bf)
                    vals.append(
                        f"('{va}/{vb}', {level}, {int(mask.sum())}, "
                        f"{float(ndi.sum())!r}, {float(ndi.min())!r}, "
                        f"{float(ndi.max())!r})"
                    )
    return f"""
WITH v(pair, level, n_px, ndi_sum, ndi_min, ndi_max) AS (VALUES
  {", ".join(vals)})
SELECT pair, level, CAST(SUM(n_px) AS BIGINT) AS n_px,
       ROUND(SUM(ndi_sum), 6) AS ndi_sum,
       MIN(ndi_min) AS ndi_min, MAX(ndi_max) AS ndi_max
FROM v GROUP BY pair, level
"""


@register("band_ndi", _ndi_oracle)
def band_ndi_q(spark, sf_dir):
    """Cross-band normalized-difference index over the merged mosaics.

    ``raster_math.band_ndi`` joins each pair's tile tables on the tile key
    (co-keyed sort-merge join — co-located and shuffle-free on a bucketed
    tile store) and evaluates (a-b)/(a+b) on co-filled pixels only.  The
    oracle re-derives the same stats from per-scene-pair footprint
    intersections with no tile grid at all, so agreement proves join
    completeness, nodata masking, and the per-pixel float path.
    """
    from ..sources.images import generate_images_df
    from . import raster_math, tiling

    merged = tiling.merge_tiles(
        tiling.build_tiles(generate_images_df(spark, _N_IMG_NDI), repartition=False)
    )
    frames = []
    for va, vb in _NDI_PAIRS:
        frames.append(
            raster_math.band_ndi(merged, va, vb).withColumn(
                "pair", F.lit(f"{va}/{vb}")
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.groupBy("pair", "level").agg(
        F.sum("n_px").alias("n_px"),
        F.round(F.sum("ndi_sum"), 6).alias("ndi_sum"),
        F.min("ndi_min").alias("ndi_min"),
        F.max("ndi_max").alias("ndi_max"),
    )


def _change_oracle() -> str:
    """Per-(scene, level) exact integer diff metrics between the original
    and the revision-resolved catalog, aggregated per (var, level) in SQL.
    Unrevised scenes contribute zero rows of exact zeros — their presence
    pins that the engine diffs ALL tiles, not just suspected-dirty ones."""
    import numpy as np

    from ..sources import images as img_src

    vals = []
    for i in range(_N_IMG_TC):
        var = img_src.band_for(i)
        la = _scene_level_arrays(i)
        lb = _scene_level_arrays(i, rev=1) if i % _TC_REV_EVERY == 0 else la
        for level in sorted(la):
            d = np.abs(la[level][0].astype(np.int64) - lb[level][0].astype(np.int64))
            vals.append(
                f"('{var}', {level}, {int((d > 0).sum())}, "
                f"{int(d.sum())}, {int(d.max())})"
            )
    return f"""
WITH v(var, level, n_px_changed, sum_abs_diff, max_abs_diff) AS (VALUES
  {", ".join(vals)})
SELECT var, level, CAST(SUM(n_px_changed) AS BIGINT) AS n_px_changed,
       CAST(SUM(sum_abs_diff) AS BIGINT) AS sum_abs_diff,
       CAST(MAX(max_abs_diff) AS BIGINT) AS max_abs_diff
FROM v GROUP BY var, level
"""


@register("change_detect", _change_oracle)
def change_detect(spark, sf_dir):
    """Reprocessing QA: pixel-exact diff of two catalog states per band.

    Builds the original 24-scene mosaic and the revision-resolved one
    (every 3rd scene reprocessed), then ``raster_math.change_stats`` joins
    the two merged tile tables on the full tile key and diffs canvases with
    exact integer arithmetic.  The oracle computes the same metrics
    per-scene with no tile machinery; matching totals prove the join is
    total (unchanged tiles produce exact zeros) and the revision content
    flowed through both cuts untouched.
    """
    from ..sources.images import generate_images_df, generate_revision_df
    from . import raster_math, tiling

    base = generate_images_df(spark, _N_IMG_TC)
    revs = generate_revision_df(
        spark, [i for i in range(_N_IMG_TC) if i % _TC_REV_EVERY == 0], rev=1
    )
    old = tiling.merge_tiles(tiling.build_tiles(base, repartition=False))
    new = tiling.merge_tiles(
        tiling.build_tiles(
            tiling.latest_revision(base.unionByName(revs)), repartition=False
        )
    )
    return raster_math.change_stats(old, new).groupBy("var", "level").agg(
        F.sum("n_px_changed").alias("n_px_changed"),
        F.sum("sum_abs_diff").alias("sum_abs_diff"),
        F.max("max_abs_diff").alias("max_abs_diff"),
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


_EVT_ENRICH_ORACLE = """
WITH v AS (SELECT event_id AS view_id, user_id, ts FROM events
           WHERE event_type = 'view'),
     p AS (SELECT event_id AS purchase_id, user_id, ts FROM events
           WHERE event_type = 'purchase')
SELECT v.user_id, v.view_id, p.purchase_id,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS delta_us
FROM v JOIN p ON p.user_id = v.user_id
              AND p.ts >= v.ts
              AND p.ts <= v.ts + INTERVAL 120 MINUTES"""


@register("streaming_enrich_join", _EVT_ENRICH_ORACLE)
def streaming_enrich_join(spark, sf_dir):
    """Watermarked stream-stream interval join as a REAL streaming query.

    Two readStream sources over the same event ingest (views and
    purchases), joined on user plus a 2-hour event-time range under
    60-min watermarks on BOTH sides; input staged as two time-split
    micro-batches (maxFilesPerTrigger=1), so cross-batch matches prove
    the join state carries between triggers.  The drained result must
    equal the batch interval join (the oracle); the range predicate is
    what lets Spark evict join state past the watermark horizon.
    """
    import os

    from ..streaming.enrich import stream_interval_join

    return stream_interval_join(spark, os.path.join(sf_dir, "events.parquet"))


# ---------------------------------------------------------------------------
# oracle twins for the two engine-internal pipelines
#
# Both pipelines' OUTPUTS are deterministic functions of the synthetic
# 32-image catalog: the resumable sink's per-(band, level) merged tile
# counts and the AvailableNow drain's per-level fragment counts are pure
# scene geometry.  The twins run the IDENTICAL side-effecting pipelines
# and hash-check against a sequential floor-arithmetic replay of the tile
# grid (same formulas `_pyramid_sql` uses, extended to the cross-scene
# tile-key union the merge step produces) — so resume/streaming, the last
# rows-only family, gets driver-visible hash coverage too.
# ---------------------------------------------------------------------------


def _tile_geometry_replay(n_img: int):
    """(units, frags): merged tile-key sets per (var, level) and fragment
    counts per level, replayed from scene anchors + overview levels."""
    import math

    from ..functions import gridlib
    from ..sources import images as img_src

    units: dict[tuple, set] = {}
    frags: dict[int, int] = {}
    for i in range(n_img):
        w, h = img_src.image_dims(i)
        var = img_src.band_for(i)
        ax, ay = img_src.scene_anchor(i)
        top = ay + h * img_src.PIXEL_SIZE_M
        for lv in gridlib.overview_levels(w, h, min_dimension=64):
            level, lw, lh = lv["level"], lv["width"], lv["height"]
            px = 10.0 * 2**level
            tm = 256.0 * px
            tx0 = math.floor(ax / tm)
            tx1 = math.floor((ax + lw * px - 1e-9) / tm)
            ty0 = math.floor((top - lh * px + 1e-9) / tm)
            ty1 = math.floor((top - 1e-9) / tm)
            s = units.setdefault((var, level), set())
            s.update(
                (tx, ty)
                for tx in range(tx0, tx1 + 1)
                for ty in range(ty0, ty1 + 1)
            )
            frags[level] = frags.get(level, 0) + (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    return units, frags


def _resume_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    units, _ = _tile_geometry_replay(_N_IMG)
    rows = [
        (var, level, True, True, len(keys))
        for (var, level), keys in sorted(units.items())
    ]
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("level", "INTEGER"),
            ("run1_written", "BOOLEAN"),
            ("run2_skipped", "BOOLEAN"),
            ("n_tiles", "INTEGER"),
        ],
        rows,
    )


@register("resume_tile_write_fp", _resume_fp_oracle)
def resume_tile_write_fp(spark, sf_dir):
    """``resume_tile_write``'s oracle twin: the identical double-run
    checkpointed sink; written/skipped contract booleans plus merged tile
    counts hash-checked against the tile-key-union geometry replay."""
    return resume_tile_write(spark, sf_dir)


def _streaming_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    _, frags = _tile_geometry_replay(_N_IMG)
    return _values_sql(
        [("level", "INTEGER"), ("n_fragments", "BIGINT")],
        sorted(frags.items()),
    )


@register("streaming_tiles_fp", _streaming_fp_oracle)
def streaming_tiles_fp(spark, sf_dir):
    """``streaming_tiles``'s oracle twin: the identical Trigger.AvailableNow
    drain; per-level fragment counts hash-checked against the
    per-scene intersect-count geometry replay."""
    return streaming_tiles(spark, sf_dir)
