"""Vector -> raster: exact Bresenham rasterization of line segments
into the tile grid.

The engine's raster->vector side (``render.py``, ``contours.py``,
``boundaries.py``) had no inverse for LINEAR features: burning road /
trajectory / coastline geometries into tile rasters is the standard
prep for training segmentation models on EO imagery.  ``rasterize_lines``
walks each segment with the classic integer midpoint (Bresenham) DDA —
8-connected, error accumulator ``e2 = 2*err`` form, no floats — and
aggregates per-(segment, tile) PARTIAL sums map-side inside the Arrow
kernel, so the shuffle carries one row per segment-tile incidence
(a segment touches O(length/256) tiles), never per-pixel rows.  Pixels
are counted per segment visit (multiset semantics): overlapping
segments burn independently, matching additive heatmap rasterization.

Fixture: 500 segments with arithmetic endpoints
``(128 + (i*37) % 768, 128 + (i*59) % 768)`` and deltas
``((i*17) % 257 - 128, (i*23) % 257 - 128)`` — endpoints stay inside
the 1024 canvas by construction.  Oracle: sequential replay of the same
kernel aggregated to per-tile VALUES (the distributed plumbing — Arrow
batching, map-side combine, tile shuffle — is what the driver match
proves; the kernel itself is pinned against a hand-derived golden in
pytest).

Reference context: the reference rasterizes only whole-array grids
(``conversion/geozarr.py`` write path); segment burning extends its
tile-grid geometry to vector layers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fixture_range
from .registry import register

CANVAS = 1024
TILE = 256
_N_SEGS = 500


def seg_endpoints(ids: np.ndarray) -> tuple[np.ndarray, ...]:
    ids = ids.astype(np.int64)
    x0 = 128 + (ids * 37) % 768
    y0 = 128 + (ids * 59) % 768
    return x0, y0, x0 + (ids * 17) % 257 - 128, y0 + (ids * 23) % 257 - 128


def bresenham(x0: int, y0: int, x1: int, y1: int) -> tuple[np.ndarray, np.ndarray]:
    """8-connected integer line from (x0,y0) to (x1,y1) inclusive —
    the classic error-accumulator midpoint walk, exact integers."""
    dx, dy = abs(x1 - x0), -abs(y1 - y0)
    sx, sy = (1 if x0 < x1 else -1), (1 if y0 < y1 else -1)
    err = dx + dy
    xs, ys = [], []
    x, y = x0, y0
    while True:
        xs.append(x)
        ys.append(y)
        if x == x1 and y == y1:
            break
        e2 = 2 * err
        if e2 >= dy:
            err += dy
            x += sx
        if e2 <= dx:
            err += dx
            y += sy
    return np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64)


def _seg_tile_partials(seg_ids: np.ndarray) -> pd.DataFrame:
    """Per-(segment, tile) partial sums: n_px, xsum, ysum, wsum where
    wsum = sum(x * CANVAS + y) — position-sensitive fingerprint."""
    x0, y0, x1, y1 = seg_endpoints(seg_ids)
    rows = []
    for i in range(len(seg_ids)):
        xs, ys = bresenham(int(x0[i]), int(y0[i]), int(x1[i]), int(y1[i]))
        tx, ty = xs // TILE, ys // TILE
        key = tx * (CANVAS // TILE) + ty
        for k in np.unique(key):
            m = key == k
            rows.append(
                (
                    int(k) // (CANVAS // TILE),
                    int(k) % (CANVAS // TILE),
                    int(m.sum()),
                    int(xs[m].sum()),
                    int(ys[m].sum()),
                    int((xs[m] * CANVAS + ys[m]).sum()),
                )
            )
    return pd.DataFrame(
        rows, columns=["tile_x", "tile_y", "n_px", "xsum", "ysum", "wsum"]
    )


def _raster_kernel(batches):
    for pdf in batches:
        out = _seg_tile_partials(pdf["seg_id"].to_numpy(dtype=np.int64))
        if len(out):
            yield out


def rasterize_lines(segs: DataFrame) -> DataFrame:
    """Per-tile burn statistics of the segment set: map-side Bresenham +
    per-(segment, tile) combine in the kernel, one tile shuffle."""
    partial = segs.select("seg_id").mapInPandas(
        _raster_kernel,
        "tile_x bigint, tile_y bigint, n_px bigint,"
        " xsum bigint, ysum bigint, wsum bigint",
    )
    return partial.groupBy("tile_x", "tile_y").agg(
        F.sum("n_px").alias("n_px"),
        F.sum("xsum").alias("xsum"),
        F.sum("ysum").alias("ysum"),
        F.sum("wsum").alias("wsum"),
    )


def _raster_oracle() -> str:
    from .mosaic_fp import _values_sql

    pdf = _seg_tile_partials(np.arange(_N_SEGS))
    agg = pdf.groupby(["tile_x", "tile_y"], as_index=False).sum()
    rows = [tuple(int(v) for v in r) for r in agg.itertuples(index=False)]
    return _values_sql(
        [("tile_x", "BIGINT"), ("tile_y", "BIGINT"), ("n_px", "BIGINT"),
         ("xsum", "BIGINT"), ("ysum", "BIGINT"), ("wsum", "BIGINT")],
        rows,
    )


@register("rasterize_lines_fp", _raster_oracle)
def rasterize_lines_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burn the 500-segment fixture into the 4x4 tile grid; per-tile
    pixel counts + position-weighted sums vs the sequential replay."""
    segs = fixture_range(spark, _N_SEGS).select(F.col("id").alias("seg_id"))
    return rasterize_lines(segs)
