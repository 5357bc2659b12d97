"""Temporal compositing over overlapping scenes: per-pixel median
(cloud-free "best pixel" composite) and feathered weighted blending.

The reference's merge semantics are last-write-wins overwrite
(`src/eopf_geozarr/conversion/geozarr.py` writes band arrays scene by
scene); the two operators here are the EO compositing siblings every
production mosaic pipeline pairs with that: a **median composite**
(per-pixel median across all scenes observing the pixel — the standard
cloud-free Sentinel-2 annual-mosaic recipe) and a **feathered blend**
(per-pixel weighted mean with weight = distance to the contributing
scene's edge, removing visible seams at scene boundaries).

Scale design — both are the SAME one-shuffle shape as
``tiling.merge_tiles``:

* raw scene->tile fragments hash-repartition on the tile key and stream
  sorted through one ``mapInPandas`` generator (one Arrow stream per
  task, no per-group frame overhead) — the single scene->tile
  redistribution shuffle of the pipeline;
* per-group memory is ``depth x TILE_PX^2`` where depth = number of
  scenes observing the tile — the temporal revisit count (dozens for a
  yearly Sentinel-2 stack), bounded and independent of corpus size;
* every emitted figure is an exact int64: the median of uint16 pixels is
  fingerprinted as ``sum(2 * median)`` (for sorted ints the doubled
  median ``m_lo + m_hi`` is itself an integer), and the blend keeps the
  exact rational ``(sum(weight * value), sum(weight))`` — integer sums
  are associative, so shuffle/fetch order cannot change a single bit,
  and the DuckDB oracle replays them bit-identically;
* the blend's feather weights are pure integer arithmetic on the
  fragment's scene-relative coordinates, recomputed from the tile key +
  offsets (no extra columns shipped through the shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image, encode_image
from ..sources import images as img_src
from .tiling import TILE_PX

_PX = int(img_src.PIXEL_SIZE_M)

_MEDIAN_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("n_frags", T.IntegerType(), False),
        T.StructField("obs_px", T.LongType(), False),
        T.StructField("obs_total", T.LongType(), False),
        T.StructField("max_depth", T.IntegerType(), False),
        T.StructField("med2_sum", T.LongType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

_BLEND_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("n_frags", T.IntegerType(), False),
        T.StructField("covered_px", T.LongType(), False),
        T.StructField("num_sum", T.LongType(), False),
        T.StructField("den_sum", T.LongType(), False),
    ]
)


def _stream_groups(frags: DataFrame, emit, out_schema: T.StructType) -> DataFrame:
    """merge_tiles' shuffle shape: hash-repartition on the tile key, sort
    within partitions, stream groups through one generator.  ``emit``
    maps (key, fragment list) -> output dict; fragment = the full row."""
    n_shuffle = int(
        frags.sparkSession.conf.get("spark.sql.shuffle.partitions", "64")
    )

    def stream(batches):
        cur_key: tuple | None = None
        rows: list = []
        out: list[dict] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key = (row.var, row.level, row.tile_x, row.tile_y)
                if key != cur_key:
                    if cur_key is not None:
                        out.append(emit(cur_key, rows))
                    cur_key, rows = key, []
                rows.append(row)
                if len(out) >= 64:
                    yield pd.DataFrame.from_records(out)
                    out = []
        if cur_key is not None:
            out.append(emit(cur_key, rows))
        if out:
            yield pd.DataFrame.from_records(out)
        elif cur_key is None:
            yield pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema.fields}
            )

    return (
        frags.repartition(n_shuffle, "var", "level", "tile_x", "tile_y")
        # sums/medians below are order-independent; the sort only groups
        # rows (image_id uniquifies nothing the math needs)
        .sortWithinPartitions("var", "level", "tile_x", "tile_y")
        .mapInPandas(stream, out_schema)
    )


def median_fingerprint(stack: list[tuple[int, int, np.ndarray]]):
    """Exact composite figures of one tile's fragment stack
    [(oy, ox, uint16 block)]: (obs_px, obs_total, max_depth, med2_sum,
    floor-median canvas).  Shared verbatim with the sequential oracle
    replay and the pytests — the engine and the oracle disagree only if
    the DISTRIBUTED plumbing around this kernel is wrong."""
    depth = np.zeros((TILE_PX, TILE_PX), dtype=np.int32)
    for oy, ox, block in stack:
        depth[oy : oy + block.shape[0], ox : ox + block.shape[1]] += 1
    kmax = int(depth.max()) if stack else 0
    if kmax == 0:
        z = np.zeros((TILE_PX, TILE_PX), dtype=np.uint16)
        return 0, 0, 0, 0, z
    vals = np.full((kmax, TILE_PX, TILE_PX), -1, dtype=np.int32)
    fill = np.zeros((TILE_PX, TILE_PX), dtype=np.int32)
    for oy, ox, block in stack:
        sl = (slice(oy, oy + block.shape[0]), slice(ox, ox + block.shape[1]))
        # scatter each observation into its pixel's next free slot
        sub_fill = fill[sl]
        yy, xx = np.mgrid[sl]
        vals[sub_fill, yy, xx] = block
        fill[sl] = sub_fill + 1
    # ascending sort puts the -1 sentinels first; the k observed values
    # of a pixel with depth d occupy slots kmax-d .. kmax-1
    vals.sort(axis=0)
    d = depth
    lo_idx = kmax - d + (d - 1) // 2
    hi_idx = kmax - d + d // 2
    ii = np.clip(lo_idx, 0, kmax - 1)
    jj = np.clip(hi_idx, 0, kmax - 1)
    yy, xx = np.mgrid[0:TILE_PX, 0:TILE_PX]
    med2 = np.where(d > 0, vals[ii, yy, xx] + vals[jj, yy, xx], 0).astype(np.int64)
    obs_px = int((d > 0).sum())
    obs_total = int(d.sum())
    med_canvas = (med2 // 2).astype(np.uint16)
    return obs_px, obs_total, kmax, int(med2.sum()), med_canvas


def median_composite(frags: DataFrame) -> DataFrame:
    """Per-pixel median across all scene fragments observing each tile
    pixel — the cloud-free composite.  Output carries the floor-median
    canvas plus exact integer fingerprints (see module docstring)."""

    def emit(key, rows) -> dict:
        var, level, tx, ty = key
        stack = [
            (r.off_y, r.off_x, decode_image(r.data, "raw-u16", r.tile_w, r.tile_h))
            for r in rows
        ]
        obs_px, obs_total, kmax, med2_sum, med = median_fingerprint(stack)
        return {
            "var": str(var),
            "level": int(level),
            "tile_x": int(tx),
            "tile_y": int(ty),
            "n_frags": len(rows),
            "obs_px": obs_px,
            "obs_total": obs_total,
            "max_depth": kmax,
            "med2_sum": med2_sum,
            "data": encode_image(med, "raw-u16"),
        }

    return _stream_groups(frags, emit, _MEDIAN_SCHEMA)


def feather_weights(i: int, tile_x: int, tile_y: int, off_x: int, off_y: int,
                    tw: int, th: int) -> np.ndarray:
    """Integer feather weights of fragment pixels: min distance-to-edge
    (in pixels, >=1) within scene ``i``.  Scene-relative coordinates are
    recomputed from the tile key + offsets — anchors sit on the tile
    grid and dims are pixel-exact, so everything is integer."""
    w, h = img_src.image_dims(i)
    ax, ay = img_src.scene_anchor(i)
    c0 = tile_x * TILE_PX + off_x - round(ax / _PX)
    # canvas rows run southward from the tile's north edge
    top_px = (tile_y + 1) * TILE_PX - off_y
    r0 = round(ay / _PX) + h - top_px
    rr = np.arange(r0, r0 + th)[:, None]
    cc = np.arange(c0, c0 + tw)[None, :]
    w_r = np.minimum(rr + 1, h - rr)
    w_c = np.minimum(cc + 1, w - cc)
    return np.minimum(w_r, w_c).astype(np.int64)


def feather_blend(frags: DataFrame) -> DataFrame:
    """Edge-distance-weighted blend of overlapping scenes (seamline
    feathering).  Keeps the exact rational per tile:
    ``num_sum = sum(weight * value)``, ``den_sum = sum(weight)`` — both
    int64 (weight <= max scene dim / 2, value <= 65535: no overflow
    below ~2^40 observations per tile)."""

    def emit(key, rows) -> dict:
        var, level, tx, ty = key
        if level != 0:
            # feather weights are scene-relative level-0 pixel distances;
            # pyramid levels blend their own composited parents instead
            raise ValueError("feather_blend expects level-0 fragments")
        num = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
        den = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
        for r in rows:
            block = decode_image(r.data, "raw-u16", r.tile_w, r.tile_h).astype(
                np.int64
            )
            wts = feather_weights(
                img_src.image_index(r.image_id), tx, ty,
                r.off_x, r.off_y, r.tile_w, r.tile_h,
            )
            sl = (slice(r.off_y, r.off_y + r.tile_h),
                  slice(r.off_x, r.off_x + r.tile_w))
            num[sl] += wts * block
            den[sl] += wts
        return {
            "var": str(var),
            "level": int(level),
            "tile_x": int(tx),
            "tile_y": int(ty),
            "n_frags": len(rows),
            "covered_px": int((den > 0).sum()),
            "num_sum": int(num.sum()),
            "den_sum": int(den.sum()),
        }

    return _stream_groups(frags, emit, _BLEND_SCHEMA)


# ---------------------------------------------------------------------------
# registered oracle-twin queries (the zonal_stats_fp pattern): the same
# distributed plan at a fixed fixture size, hash-checked by the driver
# against a sequential direct replay emitted as a DuckDB VALUES literal
# ---------------------------------------------------------------------------

from . import replay  # noqa: E402
from .mosaic_fp import _values_sql  # noqa: E402
from .registry import register  # noqa: E402

#: fixture size: first N for which same-band scenes overlap (max depth 2,
#: ~258k overlapping pixels at 96 — the compositing case is non-vacuous;
#: asserted by tests/test_composite.py)
_COMPOSITE_N = 96


def _frag_stacks(n_images: int) -> dict[tuple, list]:
    stacks: dict[tuple, list] = {}
    for var, tx, ty, oy, ox, block in replay.placements(n_images):
        stacks.setdefault((var, tx, ty), []).append((oy, ox, block))
    return stacks


def _level0_frags(spark) -> DataFrame:
    from ..sources.images import generate_images_df
    from . import tiling

    images = generate_images_df(spark, _COMPOSITE_N)
    return tiling.build_tiles(images, repartition=False).filter(
        F.col("level") == 0
    )


def _median_oracle() -> str:
    rows = []
    for (var, tx, ty), stack in sorted(_frag_stacks(_COMPOSITE_N).items()):
        obs_px, obs_total, kmax, med2_sum, _ = median_fingerprint(stack)
        rows.append((var, tx, ty, len(stack), obs_px, obs_total, kmax, med2_sum))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_frags", "INTEGER"),
            ("obs_px", "BIGINT"),
            ("obs_total", "BIGINT"),
            ("max_depth", "INTEGER"),
            ("med2_sum", "BIGINT"),
        ],
        rows,
    )


@register("median_composite_fp", _median_oracle)
def median_composite_fp(spark, sf_dir):
    """Cloud-free median composite over the 96-scene overlap fixture:
    per-tile exact integer fingerprints of the per-pixel median."""
    return median_composite(_level0_frags(spark)).select(
        "var", "tile_x", "tile_y", "n_frags",
        "obs_px", "obs_total", "max_depth", "med2_sum",
    )


def _blend_oracle() -> str:
    stacks: dict[tuple, list] = {}
    for i, var, tx, ty, oy, ox, block in replay.placements(
        _COMPOSITE_N, with_index=True
    ):
        stacks.setdefault((var, tx, ty), []).append((i, oy, ox, block))
    rows = []
    for (var, tx, ty), stack in sorted(stacks.items()):
        num = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
        den = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
        for i, oy, ox, block in stack:
            wts = feather_weights(i, tx, ty, ox, oy, block.shape[1], block.shape[0])
            sl = (slice(oy, oy + block.shape[0]), slice(ox, ox + block.shape[1]))
            num[sl] += wts * block.astype(np.int64)
            den[sl] += wts
        rows.append(
            (var, tx, ty, len(stack), int((den > 0).sum()),
             int(num.sum()), int(den.sum()))
        )
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_frags", "INTEGER"),
            ("covered_px", "BIGINT"),
            ("num_sum", "BIGINT"),
            ("den_sum", "BIGINT"),
        ],
        rows,
    )


@register("feather_blend_fp", _blend_oracle)
def feather_blend_fp(spark, sf_dir):
    """Seam-feathered blend over the 96-scene overlap fixture: exact
    integer (sum(w*v), sum(w)) rationals per tile."""
    return feather_blend(_level0_frags(spark)).select(
        "var", "tile_x", "tile_y", "n_frags", "covered_px", "num_sum", "den_sum"
    )


# ---------------------------------------------------------------------------
# temporal trend: per-pixel OLS slope sign over the scene time series
# ---------------------------------------------------------------------------

_TREND_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("trend_px", T.LongType(), False),
        T.StructField("pos_trend_px", T.LongType(), False),
        T.StructField("neg_trend_px", T.LongType(), False),
        T.StructField("trend_num_sum", T.LongType(), False),
    ]
)


def trend_fingerprint(stack: list[tuple[int, int, int, np.ndarray]]):
    """Exact per-tile trend figures of [(t, oy, ox, block)] with ``t`` the
    scene index (the fixture's time proxy).  Per pixel with depth n >= 2
    the OLS slope SIGN equals the sign of the integer numerator
    ``n * sum(t*v) - sum(t) * sum(v)`` (the positive denominator
    ``n * sum(t^2) - sum(t)^2`` is dropped) — all int64, no floats.
    Shared verbatim with the sequential oracle replay."""
    n = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
    st = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
    sv = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
    stv = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
    for t, oy, ox, block in stack:
        sl = (slice(oy, oy + block.shape[0]), slice(ox, ox + block.shape[1]))
        b = block.astype(np.int64)
        n[sl] += 1
        st[sl] += t
        sv[sl] += b
        stv[sl] += t * b
    num = n * stv - st * sv
    multi = n >= 2
    return (
        int(multi.sum()),
        int((multi & (num > 0)).sum()),
        int((multi & (num < 0)).sum()),
        int(num[multi].sum()),
    )


def temporal_trend(frags: DataFrame) -> DataFrame:
    """Per-tile counts of rising/falling pixels across the scene series
    (depth >= 2), plus the exact integer slope-numerator sum.  Same
    one-shuffle stream shape as ``median_composite``; the four per-pixel
    accumulators are combinable int64 sums, so order is irrelevant."""

    def emit(key, rows) -> dict:
        var, level, tx, ty = key
        stack = [
            (
                img_src.image_index(r.image_id),
                r.off_y,
                r.off_x,
                decode_image(r.data, "raw-u16", r.tile_w, r.tile_h),
            )
            for r in rows
        ]
        trend_px, pos_px, neg_px, num_sum = trend_fingerprint(stack)
        return {
            "var": str(var),
            "level": int(level),
            "tile_x": int(tx),
            "tile_y": int(ty),
            "trend_px": trend_px,
            "pos_trend_px": pos_px,
            "neg_trend_px": neg_px,
            "trend_num_sum": num_sum,
        }

    return _stream_groups(frags, emit, _TREND_SCHEMA)


def _trend_oracle() -> str:
    stacks: dict[tuple, list] = {}
    for i, var, tx, ty, oy, ox, block in replay.placements(
        _COMPOSITE_N, with_index=True
    ):
        stacks.setdefault((var, tx, ty), []).append((i, oy, ox, block))
    rows = []
    for (var, tx, ty), stack in sorted(stacks.items()):
        trend_px, pos_px, neg_px, num_sum = trend_fingerprint(stack)
        rows.append((var, tx, ty, trend_px, pos_px, neg_px, num_sum))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("trend_px", "BIGINT"),
            ("pos_trend_px", "BIGINT"),
            ("neg_trend_px", "BIGINT"),
            ("trend_num_sum", "BIGINT"),
        ],
        rows,
    )


@register("temporal_trend_fp", _trend_oracle)
def temporal_trend_fp(spark, sf_dir):
    """Pixel trend over the 96-scene overlap fixture: rising/falling
    counts + exact slope-numerator sums per tile."""
    return temporal_trend(_level0_frags(spark)).select(
        "var", "tile_x", "tile_y",
        "trend_px", "pos_trend_px", "neg_trend_px", "trend_num_sum",
    )
