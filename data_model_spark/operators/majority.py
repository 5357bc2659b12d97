"""Focal majority (mode) filter — the classification-raster smoother.

The mean-family focal ops (``focal.py``) are wrong for categorical
rasters (SCL scene classification, land-cover codes): averaging class
9 (cloud) with class 4 (vegetation) is meaningless.  The standard
smoother is the 3x3 MAJORITY filter (salt-and-pepper removal before
vectorization / change detection), with a deterministic tie-break —
smallest class wins, the first-argmax convention of ``hough.py``.

Classes here are the u16 mosaic quantized to 16 levels (``t >> 12``) —
the same palette trick the Otsu/equalize twins use to make a
synthetic-reflectance fixture behave like a categorical band.  The
window vote is fully vectorized: 9 shifted views of the radius-1
padded canvas, per-class one-hot counts, argmax over the class axis —
no per-pixel Python.

Scale shape: the ``focal_stats`` radius-1 halo exchange (ONE edge-strip
shuffle, ~3% volume) then map-only; per-tile integer fingerprints
(mode sum, changed-pixel count, chunked-mod checksum).  Oracle:
sequential replay over the identical padded canvases
(``replay.padded``), the ``mosaic_fp`` pattern.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .focal import TILE_PX, halo_exchange
from .registry import register

N_IMG = 24
N_CLASS = 16
SHIFT = 12  # u16 -> 16-class palette


def majority_kernel(canvas: np.ndarray) -> np.ndarray:
    """(n, n) int64 3x3-majority classes of the core of a radius-1
    padded canvas; ties break to the SMALLEST class."""
    n = canvas.shape[0] - 2
    cls = (canvas.astype(np.int64) >> SHIFT).clip(0, N_CLASS - 1)
    stack = np.stack(
        [cls[dy : dy + n, dx : dx + n] for dy in range(3) for dx in range(3)]
    )
    counts = np.stack([(stack == c).sum(axis=0) for c in range(N_CLASS)])
    return np.argmax(counts, axis=0).astype(np.int64)  # first max = smallest


def majority_features(canvas: np.ndarray) -> dict:
    from .harris import ck_mod

    n = canvas.shape[0] - 2
    mode = majority_kernel(canvas)
    center = (canvas[1 : 1 + n, 1 : 1 + n].astype(np.int64) >> SHIFT).clip(
        0, N_CLASS - 1
    )
    return {
        "mode_sum": int(mode.sum()),
        "n_changed": int((mode != center).sum()),
        "ck_mode": ck_mod(mode.ravel()),
    }


_OUT_FIELDS = [
    T.StructField("mode_sum", T.LongType()),
    T.StructField("n_changed", T.LongType()),
    T.StructField("ck_mode", T.LongType()),
]


def majority_tiles(tiles: DataFrame) -> DataFrame:
    def compute(P: np.ndarray, n_halo: int) -> dict:
        return majority_features(P)

    return halo_exchange(tiles, radius=1, compute=compute, out_fields=_OUT_FIELDS)


def _majority_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var, tx, ty in sorted(cv):
        fp = majority_features(replay.padded(cv, var, tx, ty))
        rows.append((var, tx, ty, fp["mode_sum"], fp["n_changed"], fp["ck_mode"]))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("mode_sum", "BIGINT"),
            ("n_changed", "BIGINT"),
            ("ck_mode", "BIGINT"),
        ],
        rows,
    )


@register("majority_filter_fp", _majority_oracle)
def majority_filter_fp(spark, sf_dir):
    """3x3 majority-class fingerprints of every merged-mosaic tile —
    hash-checked against the sequential padded-canvas replay."""
    from .hydrology import _merged_tiles

    out = majority_tiles(_merged_tiles(spark))
    return out.select("var", "tile_x", "tile_y", "mode_sum", "n_changed", "ck_mode")
