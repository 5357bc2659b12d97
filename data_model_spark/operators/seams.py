"""Mosaic seam QA — boundary-discontinuity audit between adjacent tiles.

After any mosaic/composite step (``tiling.merge_tiles``, the temporal
composites, feathered blends) the classic failure mode is a visible
seam: adjacent tiles whose shared boundary shows a step discontinuity
(different source scenes, revision mismatches, miscalibrated sensors).
This operator measures every stored tile adjacency exactly: for each
east-west pair the 256-pixel |difference| profile between the east
column of the west tile and the west column of the east tile, reduced
to the integer sum (SAD) and max; likewise for each north-south pair.

Scale shape — bytes move O(perimeter), not O(area): one map-only
``mapInPandas`` extracts four 256-value edge strips per tile (1/64 of
the tile's pixels), then TWO hash equi-joins on the shifted tile key
(``(var, ty, tx) x (var, ty, tx+1)`` and ``(var, tx, ty) x (var, tx,
ty+1)``) pair adjacent strips, and the seam reduction itself runs
JVM-side (``zip_with`` + ``aggregate`` + ``array_max`` — whole-stage
codegen, no second Python stage).  At 10^12 tiles this is a self-join
on a co-partitioned integer key carrying 1 KB rows — the same shape as
the flagship merge, at 1.5% of its bytes.

Row convention (``operators/focal.py``): canvas row 0 is the NORTH
edge; tile (tx, ty)'s north neighbor is (tx, ty+1), so a vertical seam
pairs row 0 of (tx, ty) with row 255 of (tx, ty+1).  Oracle:
direct replay over the merged canvases (the ``mosaic_fp`` pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codecs import decode_image
from .focal import TILE_PX
from .registry import register

N_IMG = 24


def edge_strips(tiles: DataFrame) -> DataFrame:
    """One row per tile: the four 256-long edge-pixel arrays."""
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                t = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                recs.append(
                    {
                        "var": row.var,
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "north": t[0, :].astype(np.int64).tolist(),
                        "south": t[-1, :].astype(np.int64).tolist(),
                        "west": t[:, 0].astype(np.int64).tolist(),
                        "east": t[:, -1].astype(np.int64).tolist(),
                    }
                )
            cols = ["var", "tile_x", "tile_y", "north", "south", "west", "east"]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        kern,
        "var string, tile_x long, tile_y long, north array<long>, "
        "south array<long>, west array<long>, east array<long>",
    )


def _seam_cols(a_col: str, b_col: str):
    """JVM seam reduction of two edge arrays: (sad, maxad)."""
    diff = F.zip_with(F.col(a_col), F.col(b_col), lambda x, y: F.abs(x - y))
    sad = F.aggregate(diff, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return sad.alias("sad"), F.array_max(diff).alias("maxad")


def seam_qa(tiles: DataFrame) -> DataFrame:
    """(var, orient, tile_x, tile_y, sad, maxad) per stored adjacency.

    ``orient`` 'H': seam between (tx, ty) and its EAST neighbor
    (tx+1, ty), keyed by the west member.  'V': seam between (tx, ty)
    and its NORTH neighbor (tx, ty+1), keyed by the south member.
    """
    # the strip table feeds four plan branches (both sides of both
    # adjacency joins); uncheckpointed, the upstream decode pipeline
    # would re-execute per branch (lazy: the first action materializes)
    s = edge_strips(tiles).localCheckpoint(eager=False)
    a = s.select("var", "tile_x", "tile_y", "east", "north")
    be = s.select(
        F.col("var").alias("var2"),
        (F.col("tile_x") - 1).alias("jx"),
        F.col("tile_y").alias("jy"),
        F.col("west").alias("nb_west"),
    )
    h = (
        a.join(
            be,
            (a.var == be.var2) & (a.tile_x == be.jx) & (a.tile_y == be.jy),
        )
        .select(
            "var", F.lit("H").alias("orient"), "tile_x", "tile_y",
            *_seam_cols("east", "nb_west"),
        )
    )
    bn = s.select(
        F.col("var").alias("var2"),
        F.col("tile_x").alias("jx"),
        (F.col("tile_y") - 1).alias("jy"),
        F.col("south").alias("nb_south"),
    )
    v = (
        a.join(
            bn,
            (a.var == bn.var2) & (a.tile_x == bn.jx) & (a.tile_y == bn.jy),
        )
        .select(
            "var", F.lit("V").alias("orient"), "tile_x", "tile_y",
            *_seam_cols("north", "nb_south"),
        )
    )
    return h.unionByName(v)


def seam_features(
    canvases: dict[tuple, np.ndarray],
) -> list[tuple[str, str, int, int, int, int]]:
    """Sequential replay: every stored adjacency's (sad, maxad)."""
    rows = []
    for var, tx, ty in sorted(canvases):
        t = canvases[(var, tx, ty)].astype(np.int64)
        e = canvases.get((var, tx + 1, ty))
        if e is not None:
            d = np.abs(t[:, -1] - e.astype(np.int64)[:, 0])
            rows.append((var, "H", tx, ty, int(d.sum()), int(d.max())))
        n = canvases.get((var, tx, ty + 1))
        if n is not None:
            d = np.abs(t[0, :] - n.astype(np.int64)[-1, :])
            rows.append((var, "V", tx, ty, int(d.sum()), int(d.max())))
    return rows


def _seam_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("orient", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("sad", "BIGINT"),
            ("maxad", "BIGINT"),
        ],
        seam_features(replay.merged_canvases(N_IMG)),
    )


@register("seam_qa_fp", _seam_oracle)
def seam_qa_fp(spark, sf_dir):
    """Seam SAD/max profile of every stored tile adjacency in the
    merged mosaic — hash-checked against the sequential replay."""
    from .hydrology import _merged_tiles

    return seam_qa(_merged_tiles(spark))
