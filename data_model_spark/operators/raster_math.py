"""Raster algebra across bands and revisions: NDI band math, change detection.

Map algebra over the merged tile table (``tiling.merge_tiles`` output) —
the classic two-raster operators every raster stack layers over tiling:

* **Band math** (``band_ndi``): normalized difference index
  ``(a - b) / (a + b)`` between two variables' mosaics, evaluated on the
  pixels where both bands have data (canvas zeros are nodata).  The
  reference computes per-band pyramids (`conversion/geozarr.py:974-1183`);
  cross-band indices (NDVI/NDWI-style) are the first thing a consumer
  derives from them.
* **Change detection** (``change_stats``): pixel-level diff between two
  catalog states of the same variable set — the reprocessing-campaign QA
  step after ``tiling.latest_revision``: which tiles changed, by how much.

Scale design: both are a CO-KEYED EQUI-JOIN of tile tables on the tile
key (level, tile_x, tile_y [, var]) followed by a narrow Arrow stage.

* The two sides are projections of the same (or an identically
  partitioned) tile table, so the sort-merge join shuffles each side once
  on the key both are already organized by; with a bucketed/partitioned
  tile store the join is co-located and shuffle-free.
* Tile keys are unique per side — no skew, no explosion: output rows =
  min(|A|, |B|) tiles.
* Pixel work is one ``mapInPandas`` over joined canvas pairs, vectorized
  NumPy, output-proportional; nothing ever materializes a mosaic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from .tiling import TILE_PX

_NDI_SCHEMA = T.StructType(
    [
        T.StructField("level", T.IntegerType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("ndi_sum", T.DoubleType(), False),
        T.StructField("ndi_min", T.DoubleType(), False),
        T.StructField("ndi_max", T.DoubleType(), False),
    ]
)

_CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("n_px_changed", T.LongType(), False),
        T.StructField("sum_abs_diff", T.LongType(), False),
        T.StructField("max_abs_diff", T.LongType(), False),
    ]
)


def band_ndi(tiles: DataFrame, var_a: str, var_b: str) -> DataFrame:
    """Per-tile normalized difference ``(a - b) / (a + b)`` stats.

    ``tiles``: merged tile table.  Joins ``var_a``'s tiles to ``var_b``'s
    on (level, tile_x, tile_y) and evaluates the index on the pixels where
    BOTH canvases are nonzero (zero = unfilled/nodata).  Tiles whose
    canvases never co-fill a pixel are dropped.  Returns one row per
    overlapping tile: (level, tile_x, tile_y, n_px, ndi_sum, ndi_min,
    ndi_max); the per-pixel index values are bit-deterministic (single
    elementwise float64 expression), so min/max compare exactly across
    engines and only the sum needs rounding at aggregation time.
    """
    a = tiles.filter(F.col("var") == var_a).select(
        "level", "tile_x", "tile_y", F.col("data").alias("data_a")
    )
    b = tiles.filter(F.col("var") == var_b).select(
        "level", "tile_x", "tile_y", F.col("data").alias("data_b")
    )
    joined = a.join(b, ["level", "tile_x", "tile_y"])

    def compute(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                av = decode_image(row.data_a, "raw-u16", TILE_PX, TILE_PX)
                bv = decode_image(row.data_b, "raw-u16", TILE_PX, TILE_PX)
                mask = (av > 0) & (bv > 0)
                if not mask.any():
                    continue
                af = av[mask].astype(np.float64)
                bf = bv[mask].astype(np.float64)
                ndi = (af - bf) / (af + bf)
                recs.append(
                    {
                        "level": int(row.level),
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_px": int(mask.sum()),
                        "ndi_sum": float(ndi.sum()),
                        "ndi_min": float(ndi.min()),
                        "ndi_max": float(ndi.max()),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _NDI_SCHEMA.fields}
            )

    return joined.mapInPandas(compute, _NDI_SCHEMA)


def change_stats(old: DataFrame, new: DataFrame) -> DataFrame:
    """Pixel-level diff between two merged catalog states, per tile.

    Inner-joins on (var, level, tile_x, tile_y) — identical footprints on
    both sides (a reprocessing campaign revises content, not geometry), so
    the join is total.  All metrics are exact integers (uint16 diffs
    summed in int64): (n_px_changed, sum_abs_diff, max_abs_diff) per tile,
    including all-zero rows for unchanged tiles — the QA rollup downstream
    decides what "dirty" means.
    """
    o = old.select(
        "var", "level", "tile_x", "tile_y", F.col("data").alias("data_a")
    )
    n = new.select(
        "var", "level", "tile_x", "tile_y", F.col("data").alias("data_b")
    )
    joined = o.join(n, ["var", "level", "tile_x", "tile_y"])

    def compute(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                av = decode_image(row.data_a, "raw-u16", TILE_PX, TILE_PX).astype(
                    np.int64
                )
                bv = decode_image(row.data_b, "raw-u16", TILE_PX, TILE_PX).astype(
                    np.int64
                )
                d = np.abs(av - bv)
                recs.append(
                    {
                        "var": row.var,
                        "level": int(row.level),
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_px_changed": int((d > 0).sum()),
                        "sum_abs_diff": int(d.sum()),
                        "max_abs_diff": int(d.max()),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _CHANGE_SCHEMA.fields}
            )

    return joined.mapInPandas(compute, _CHANGE_SCHEMA)
