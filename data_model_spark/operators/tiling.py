"""Flagship pipeline: image table -> multiscale tile pyramid on a global grid.

Spark plan shape (designed for 10^12 rows / 1000 executors):

1. ``mapInPandas`` decode+downsample+tile-cut — narrow, no shuffle, Arrow
   batches capped by ``maxRecordsPerBatch``.  Each image emits its pyramid
   levels cut against a *global* tile grid (tile = 256 px at every level,
   level pixel size doubles per level), so output tile keys are globally
   meaningful join/partition keys.
2. ONE shuffle keyed by tile, placed where it pays:
   - merge path (the flagship): raw fragments flow straight into
     ``merge_tiles``'s ``applyInPandas`` hash shuffle; the explicit
     ``repartitionByRange(level, tile_y, tile_x)`` then runs on the merged
     tiles (4-5x smaller) right before the write.
   - direct-write path (``repartition=True``): fragments range-partition
     immediately.  Range partitioning keeps spatially-adjacent tiles
     co-located, which is what makes bbox queries partition-prunable (the
     chunk-alignment strategy of the reference, re-expressed as Spark
     partitioning).  Note ``repartitionByRange`` adds a sampling pass that
     re-executes its child — only use it on cheap-to-recompute or persisted
     inputs.
3. partitioned write (level / …) through the Iceberg-or-parquet layer.

Tile rows carry ``(px_sum, px_cnt)`` so downstream cascade levels can be
rebuilt exactly (mean-of-means correction, SURVEY.md A15) and per-partition
metrics aggregate without touching pixel bytes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..codecs import decode_image, encode_image, psnr_db
from ..functions import gridlib
from ..sources import images as img_src
from .downsample import block_mean, downsample

TILE_PX = 256

TILE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("off_x", T.IntegerType(), False),
        T.StructField("off_y", T.IntegerType(), False),
        T.StructField("tile_w", T.IntegerType(), False),
        T.StructField("tile_h", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
        T.StructField("px_sum", T.DoubleType(), False),
        T.StructField("px_cnt", T.LongType(), False),
        T.StructField("px_min", T.DoubleType(), False),
        T.StructField("px_max", T.DoubleType(), False),
    ]
)

VALIDATE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("psnr_db", T.DoubleType(), False),
        T.StructField("caption_ok", T.BooleanType(), False),
        T.StructField("phash_ok", T.BooleanType(), False),
    ]
)


def tiles_for_image(
    image_id: str,
    decoded: np.ndarray,
    anchor_x: float,
    anchor_y: float,
    pixel_m: float = img_src.PIXEL_SIZE_M,
    min_dimension: int = 64,
    var_name: str = "b02",
    level_numbers: list[int] | None = None,
) -> list[dict]:
    """Cut one image's pyramid against the global tile grid (pure NumPy).

    Returns one record per (level, intersecting global tile).  North-up:
    image row 0 is the northern edge at ``anchor_y + h*pixel_m``.

    ``level_numbers`` overrides the per-image level enumeration — used when
    this image is one CHUNK of a larger array (the Zarr ingestion path)
    and the pyramid depth must come from the ARRAY's dims, not the
    chunk's.  Per-chunk floor-division dims compose exactly to the
    whole-array cut when 2^level divides the chunk shape (chunk offsets
    and interior sizes are then 2^level-aligned, and edge chunks drop
    exactly the same remainder pixels the whole-array floor drops).
    """
    h, w = decoded.shape
    top = anchor_y + h * pixel_m
    records: list[dict] = []
    # /2 CASCADE for mean-reduced bands on cleanly-halving dims: integer
    # sums of u16 pixels are exact in int64 at any accumulation order, so
    # sum-quads level-to-level then divide by 4^level is BIT-IDENTICAL to
    # the direct native->level block mean — at ~1.33*H*W total reduction
    # cost instead of L*H*W in this hot path (asserted equal in
    # tests/test_tiling_e2e.py).  Non-halving dims or non-mean kernels fall
    # back to the direct reduction.
    from .downsample import variable_type

    cascade_ok = variable_type(var_name) == "reflectance"
    acc = None  # int64 pixel-sum accumulator at the previous level
    prev_lw = prev_lh = None
    if level_numbers is None:
        level_dims = [
            (lv["level"], lv["width"], lv["height"])
            for lv in gridlib.overview_levels(w, h, min_dimension=min_dimension)
        ]
    else:
        level_dims = [
            (lv, w // (1 << lv), h // (1 << lv)) for lv in sorted(level_numbers)
        ]
    for level, lw, lh in level_dims:
        if lw == 0 or lh == 0:
            continue  # chunk fully inside the global floor-dropped remainder
        if level == 0:
            arr = decoded
            acc = decoded.astype(np.int64)
        elif (
            cascade_ok
            and acc is not None
            and prev_lw == 2 * lw
            and prev_lh == 2 * lh
        ):
            acc = (
                acc.reshape(lh, 2, lw, 2).sum(axis=(1, 3), dtype=np.int64)
            )
            arr = (acc / 4.0**level).astype(decoded.dtype)
        else:
            acc = None  # chain broken: direct reduction from native
            arr = downsample(decoded, lh, lw, var_name)
        prev_lw, prev_lh = lw, lh
        px = pixel_m * (2**level)
        tile_m = TILE_PX * px
        # level image extent (cropping in downsample keeps the same origin)
        left = anchor_x
        tx0 = int(np.floor(left / tile_m))
        tx1 = int(np.floor((left + lw * px - 1e-9) / tile_m))
        ty0 = int(np.floor((top - lh * px + 1e-9) / tile_m))
        ty1 = int(np.floor((top - 1e-9) / tile_m))
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                # tile bounds in geo coords (tile_y indexes north-up rows)
                t_left, t_top = tx * tile_m, (ty + 1) * tile_m
                # pixel window of the intersection, in level-image indices
                c0 = max(0, int(round((t_left - left) / px)))
                c1 = min(lw, int(round((t_left + tile_m - left) / px)))
                r0 = max(0, int(round((top - t_top) / px)))
                r1 = min(lh, int(round((top - (t_top - tile_m)) / px)))
                if c1 <= c0 or r1 <= r0:
                    continue
                block = arr[r0:r1, c0:c1]
                fblock = block.astype(np.float64)
                records.append(
                    {
                        "image_id": image_id,
                        "var": var_name,
                        "level": level,
                        "tile_x": tx,
                        "tile_y": ty,
                        # placement of this block inside the 256-px tile
                        "off_x": c0 + int(round((left - t_left) / px)),
                        "off_y": r0 + int(round((t_top - top) / px)),
                        "tile_w": c1 - c0,
                        "tile_h": r1 - r0,
                        "data": encode_image(block.astype(np.uint16), "raw-u16"),
                        "px_sum": float(fblock.sum()),
                        "px_cnt": int(block.size),
                        "px_min": float(fblock.min()),
                        "px_max": float(fblock.max()),
                    }
                )
    return records


def _cut_pdf(pdf: "pd.DataFrame", min_dimension: int) -> "pd.DataFrame":
    """One image-row batch -> tile-fragment frame (the ``cut`` kernel)."""
    recs: list[dict] = []
    for row in pdf.itertuples(index=False):
        decoded = decode_image(row.bytes, row.fmt, row.w, row.h)
        i = img_src.image_index(row.image_id)
        ax, ay = img_src.scene_anchor(i)
        recs.extend(
            tiles_for_image(
                row.image_id,
                decoded,
                ax,
                ay,
                min_dimension=min_dimension,
                # band-by-band pyramid (reference geozarr.py:974-1183):
                # the band name drives the A10 kernel dispatch
                var_name=img_src.band_for(i),
            )
        )
    return pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
        {f.name: pd.Series(dtype="object") for f in TILE_SCHEMA.fields}
    )


def build_tiles(
    images: DataFrame, min_dimension: int = 64, repartition: bool = True
) -> DataFrame:
    """images DF (input_hint schema) -> tile DF, with the one explicit shuffle.

    When ``images`` is an un-cached ``generate_images_df`` plan (marked by
    the generator), the generate and cut kernels run in ONE Python stage:
    the synthetic encode and its decode+cut are chained in-process instead
    of round-tripping every encoded image JVM->Python->JVM between two
    MapInPandas nodes (guide §4 — control how many bytes cross the
    boundary).  Same kernels on the same bytes, so tile rows are
    bit-identical; cached or externally-sourced images keep the two-stage
    plan (the cache, not the generator, is then the upstream).
    """
    gen = getattr(images, "_dms_fixture_gen", None)
    if gen is not None and not images.is_cached:
        n, num_partitions, dim_cycle = gen
        spark = images.sparkSession

        def gen_cut(batches):
            for pdf in batches:
                yield _cut_pdf(
                    img_src._rows_for_indices(pdf["id"].to_numpy(), dim_cycle),
                    min_dimension,
                )

        tiles = spark.range(0, n, numPartitions=num_partitions).mapInPandas(
            gen_cut, TILE_SCHEMA
        )
    else:

        def cut(batches):
            for pdf in batches:
                yield _cut_pdf(pdf, min_dimension)

        tiles = images.mapInPandas(cut, TILE_SCHEMA)
    if repartition:
        tiles = tiles.repartitionByRange("var", "level", "tile_y", "tile_x")
    return tiles


def merge_tiles(tiles: DataFrame) -> DataFrame:
    """Merge per-image tile fragments into final global tiles.

    ``applyInPandas`` hash-shuffles on the grouping keys — this IS the one
    scene->tile redistribution shuffle of the pipeline, so feed it raw
    fragments (``build_tiles(..., repartition=False)``); a prior
    ``repartitionByRange`` would add a second full shuffle plus a sampling
    pass that re-executes the tile cut. Range-partition the *merged* output
    (4-5x smaller) before writing instead. Fragments are composited into
    the 256x256 tile canvas inside ``applyInPandas``.
    """
    out_schema = T.StructType(
        [
            T.StructField("var", T.StringType(), False),
            T.StructField("level", T.IntegerType(), False),
            T.StructField("tile_x", T.LongType(), False),
            T.StructField("tile_y", T.LongType(), False),
            T.StructField("n_sources", T.IntegerType(), False),
            T.StructField("filled_px", T.LongType(), False),
            T.StructField("data", T.BinaryType(), False),
            T.StructField("px_sum", T.DoubleType(), False),
            T.StructField("px_cnt", T.LongType(), False),
        ]
    )

    # hash-repartition by tile key + sort-within-partition + STREAMED compose:
    # one Arrow stream per task instead of one Arrow frame per group —
    # measured 4x faster than groupBy().applyInPandas() at 26k fragments /
    # 5.7k groups (5.6s vs 22s warm at 32 cores), and the gap widens with
    # group count. Per-row Python below only gathers buffer references; all
    # pixel work is vectorized NumPy.
    def compose_stream(batches):
        cur_key: tuple | None = None
        frags: list = []

        def emit() -> dict:
            var, level, tx, ty = cur_key
            canvas = np.zeros((TILE_PX, TILE_PX), dtype=np.uint16)
            filled = np.zeros((TILE_PX, TILE_PX), dtype=bool)
            ps, pc = 0.0, 0
            for f in frags:
                block = decode_image(f[0], "raw-u16", f[1], f[2])
                y0, x0 = f[4], f[3]
                canvas[y0 : y0 + f[2], x0 : x0 + f[1]] = block
                filled[y0 : y0 + f[2], x0 : x0 + f[1]] = True
                ps += f[5]
                pc += f[6]
            return {
                "var": str(var),
                "level": int(level),
                "tile_x": int(tx),
                "tile_y": int(ty),
                "n_sources": len(frags),
                "filled_px": int(filled.sum()),
                "data": encode_image(canvas, "raw-u16"),
                "px_sum": ps,
                "px_cnt": pc,
            }

        out: list[dict] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key = (row.var, row.level, row.tile_x, row.tile_y)
                if key != cur_key:
                    if cur_key is not None:
                        out.append(emit())
                    cur_key, frags = key, []
                frags.append(
                    (row.data, row.tile_w, row.tile_h, row.off_x, row.off_y,
                     row.px_sum, row.px_cnt)
                )
                if len(out) >= 64:
                    yield pd.DataFrame.from_records(out)
                    out = []
        if cur_key is not None:
            out.append(emit())
        if out:
            yield pd.DataFrame.from_records(out)
        elif cur_key is None:
            yield pd.DataFrame({f.name: pd.Series(dtype="object") for f in out_schema.fields})

    n_shuffle = int(tiles.sparkSession.conf.get("spark.sql.shuffle.partitions", "64"))
    return (
        tiles.repartition(n_shuffle, "var", "level", "tile_x", "tile_y")
        # image_id in the sort pins the compositing order: overlapping scene
        # fragments overwrite last-write-wins, so without it the merged
        # pixel bytes depend on shuffle fetch order and differ across runs
        .sortWithinPartitions("var", "level", "tile_x", "tile_y", "image_id")
        .mapInPandas(compose_stream, out_schema)
    )


def tile_metrics(tiles: DataFrame, keys: tuple[str, ...] = ("level",)) -> DataFrame:
    """Per-(keys) lineage metrics for the checkpoint table — no pixel reads.

    Default keys=(level,) for pyramid totals; pass ("var", "level") for the
    band-by-band view of a multi-band tile table.
    """
    return tiles.groupBy(*keys).agg(
        F.count("*").alias("n_tiles"),
        F.sum("px_cnt").alias("n_pixels"),
        F.sum("px_sum").alias("sum_value"),
        (F.sum("px_sum") / F.sum("px_cnt")).alias("mean_value"),
        F.min("px_min").alias("min_value"),
        F.max("px_max").alias("max_value"),
        F.countDistinct("image_id").alias("n_images"),
    )


def validate_images(images: DataFrame) -> DataFrame:
    """Per-row invariant gate (input_hint): decode vs regenerated ground truth.

    PSNR >= 40 dB for lossy fmt (inf for lossless), captions byte-equal,
    phash re-derivable from decoded pixels.
    """

    def check(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                decoded = decode_image(row.bytes, row.fmt, row.w, row.h)
                original = img_src.synth_pixels(row.image_id, row.w, row.h)
                i = img_src.image_index(row.image_id)
                recs.append(
                    {
                        "image_id": row.image_id,
                        "fmt": row.fmt,
                        "psnr_db": psnr_db(original, decoded),
                        "caption_ok": row.caption == img_src.caption_for(row.image_id, i),
                        "phash_ok": img_src.phash64(decoded) == row.phash,
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return images.mapInPandas(check, VALIDATE_SCHEMA)


def dirty_tiles(
    changed_meta: DataFrame,
    min_dimension: int = 64,
    pixel_m: float = img_src.PIXEL_SIZE_M,
) -> DataFrame:
    """Incremental pyramid maintenance: tiles touched by changed scenes.

    Given the *metadata rows* of a changed-scene set (image_id, w, h — no
    pixel bytes), computes the exact (level, tile_x, tile_y) set those
    scenes contribute to across every pyramid level, i.e. the minimal
    re-materialization work list after a partial reprocess.  At 100 TB you
    never rebuild the full pyramid: this query is the planning step that
    turns "these scenes changed" into a partition-pruned rewrite of only
    the affected tile partitions (feed its keys to a left-semi join against
    the tile table / ``ResumableTileWrite``).

    All geometry is integer JVM arithmetic from the deterministic scene
    grid (sources/images.py: anchor = (ANCHOR_X0 + (i % GRID_COLS) * step,
    ANCHOR_Y0 + (i // GRID_COLS) * step)); level enumeration replays
    ``gridlib.overview_levels`` (min(w,h) >> L >= min_dimension) and tile
    ranges replay ``tiles_for_image``'s floor/epsilon convention — exact
    when dims halve cleanly through their kept levels (the synthetic grid's
    power-of-two dims always do).  No decode, no UDF, no collect; one
    shuffle for the final per-tile aggregation.

    Returns (level, tile_x, tile_y, n_scenes) with n_scenes = number of
    distinct changed scenes contributing to that tile.
    """
    step = int(img_src.GRID_STEP_M)
    tile0_m = int(TILE_PX * pixel_m)
    px_m = int(pixel_m)
    i = F.split("image_id", "_").getItem(1).cast("long")
    base = changed_meta.select(
        "image_id",
        F.col("w").cast("long").alias("w"),
        F.col("h").cast("long").alias("h"),
        (F.lit(int(img_src.ANCHOR_X0)) + F.pmod(i, F.lit(img_src.GRID_COLS)) * step)
        .cast("long")
        .alias("ax"),
        (F.lit(int(img_src.ANCHOR_Y0)) + (i - F.pmod(i, F.lit(img_src.GRID_COLS))) / img_src.GRID_COLS * step)
        .cast("long")
        .alias("ay"),
    )
    lv = base.withColumn("level", F.explode(F.sequence(F.lit(0), F.lit(28)))).filter(
        F.expr("shiftright(least(w, h), level)") >= min_dimension
    )
    t = lv.withColumn(
        "tm", F.expr(f"cast(shiftleft({tile0_m}, level) as bigint)")
    )
    t = t.withColumn(
        "tile_x",
        F.explode(
            F.sequence(
                F.expr("ax div tm"),
                F.expr(f"(ax + w * {px_m} - 1) div tm"),
            )
        ),
    ).withColumn(
        "tile_y",
        F.explode(
            F.sequence(
                F.expr("ay div tm"),
                F.expr(f"(ay + h * {px_m} - 1) div tm"),
            )
        ),
    )
    return t.groupBy("level", "tile_x", "tile_y").agg(
        F.countDistinct("image_id").alias("n_scenes")
    )


def latest_revision(images: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Catalog resolution: keep only the newest revision of each scene.

    A reprocessing campaign appends revised rows (``sources.images.
    revision_id``: same scene index, ``_r<k>`` suffix, new content) to the
    image table; compositing must see exactly one row per scene or merged
    px_sum/px_cnt metadata double-counts the superseded pixels.  The
    numeric revision is parsed from the id (absent = 0) and a per-scene
    top-1 window keeps the max — numeric compare, so r10 > r2 where a
    lexicographic sort would get it wrong.

    One hash shuffle on the scene key; Spark rewrites the rank-1 window to
    WindowGroupLimit, so the filter pushes into the shuffle as a per-key
    running top-1, never materializing full per-scene groups.
    """
    scene = F.split(F.col(id_col), "_").getItem(1)
    parts = F.split(F.col(id_col), "_r")
    rev = F.when(
        F.size(parts) > 1, F.element_at(parts, -1).cast("int")
    ).otherwise(F.lit(0))
    w = Window.partitionBy(scene).orderBy(rev.desc(), F.col(id_col).desc())
    return (
        images.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def point_query(tiles: DataFrame, level: int, x: float, y: float,
                pixel_m: float = img_src.PIXEL_SIZE_M) -> DataFrame:
    """Partition-pruned point lookup (consumer contract R4): filter on tile keys."""
    px = pixel_m * (2**level)
    tile_m = TILE_PX * px
    tx = int(np.floor(x / tile_m))
    ty = int(np.floor(y / tile_m))
    return tiles.filter(
        (F.col("level") == level) & (F.col("tile_x") == tx) & (F.col("tile_y") == ty)
    )


def bbox_query(tiles: DataFrame, level: int, x0: float, y0: float,
               x1: float, y1: float,
               pixel_m: float = img_src.PIXEL_SIZE_M) -> DataFrame:
    """Partition-pruned bbox crop (consumer contract R4): range filter on
    tile keys only — the Spark twin of a chunk-keyed zarr range read
    (`tests/test_titiler_integration.py:256-306`)."""
    px = pixel_m * (2**level)
    tile_m = TILE_PX * px
    tx0, tx1 = int(np.floor(x0 / tile_m)), int(np.floor((x1 - 1e-9) / tile_m))
    ty0, ty1 = int(np.floor(y0 / tile_m)), int(np.floor((y1 - 1e-9) / tile_m))
    return tiles.filter(
        (F.col("level") == level)
        & F.col("tile_x").between(tx0, tx1)
        & F.col("tile_y").between(ty0, ty1)
    )
