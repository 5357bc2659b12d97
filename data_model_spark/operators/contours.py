"""Iso-contour extraction over the tiled raster (marching squares).

The classic vectorization step for elevation/score surfaces (Lorensen &
Cline's 2D case; documented by every public GIS): for each 2x2 pixel
block, the 4-bit case index of (z >= level) corner tests selects the
contour segments crossing that block.  Saddle cases 5 and 10 carry two
segments; cases 0 and 15 none.

Tile decomposition: a tile owns the blocks whose top-left pixel it
stores; the east/south corner pixels of border blocks live in neighbor
tiles — exactly the 1-px halo ``focal.halo_exchange`` ships (one
shuffle, edge strips only).  Absent neighbors are zeros (the shared
mosaic convention), so a tile at the mosaic edge produces the same cases
as the zero-padded global computation — ``tests/test_contours.py``
proves per-tile case-canvas equality against the global reference, and
pins an analytic ring golden.

All case math is integer comparisons on the int64 padded canvas —
plan-independent and bit-identical everywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .focal import halo_exchange

# segments per marching-squares case (saddles 5/10 = 2)
_SEGS = np.array([0, 1, 1, 1, 1, 2, 1, 1, 1, 1, 2, 1, 1, 1, 1, 0], dtype=np.int64)


def ms_cases(P: np.ndarray, level: int) -> np.ndarray:
    """uint8 case canvas for the blocks owned by the padded canvas' tile:
    corners (tl, tr, br, bl) -> bits (8, 4, 2, 1)."""
    h, w = P.shape[0] - 2, P.shape[1] - 2
    tl = P[1 : 1 + h, 1 : 1 + w] >= level
    tr = P[1 : 1 + h, 2 : 2 + w] >= level
    br = P[2 : 2 + h, 2 : 2 + w] >= level
    bl = P[2 : 2 + h, 1 : 1 + w] >= level
    return (
        tl.astype(np.uint8) * 8
        + tr.astype(np.uint8) * 4
        + br.astype(np.uint8) * 2
        + bl.astype(np.uint8)
    )


def contour_tiles(tiles: DataFrame, level: int) -> DataFrame:
    """Per-tile marching-squares summary at iso-level ``level``:
    (var, level, tile_x, tile_y, n_halo, cases, n_cross, n_segments)."""

    def compute(P: np.ndarray, n_halo: int) -> dict:
        cases = ms_cases(P, level)
        return {
            "cases": cases.tobytes(),
            "n_cross": int(((cases != 0) & (cases != 15)).sum()),
            "n_segments": int(_SEGS[cases].sum()),
        }

    fields = [
        T.StructField("cases", T.BinaryType(), False),
        T.StructField("n_cross", T.LongType(), False),
        T.StructField("n_segments", T.LongType(), False),
    ]
    return halo_exchange(tiles, 1, compute, fields)


def reference_cases(G: np.ndarray, level: int) -> np.ndarray:
    """Global truth: cases for every pixel of G as a block top-left, with
    zeros east/south outside the mosaic."""
    P = np.pad(G.astype(np.int64), 1)
    return ms_cases(P, level)


from .registry import register  # noqa: E402


@register("contour_tiles", None)  # pixel path; exactness in tests/test_contours.py
def contour_tiles_query(spark, sf_dir):
    """Marching-squares contour summary of the merged level-0 mosaic at
    the fixture's median intensity."""
    from .hydrology import _merged_tiles

    out = contour_tiles(_merged_tiles(spark), level=20000)
    return out.select(
        "var", "tile_x", "tile_y", "n_halo", "n_cross", "n_segments"
    )
