"""Cross-level pyramid-consistency audit — "is every overview tile the
downsample of its children?"

The reference's core multiscale invariant (block-mean /2 overview
levels, ``src/eopf_geozarr/conversion/geozarr.py``; our A1-A11 suite)
is trivially true per image by construction — but the PUBLISHED
artifact is the *merged* mosaic per level, and merge order, scene
overlap, codec round-trips, and level-grid edge cropping can all break
it silently.  Production pyramid stores run exactly this audit before
release: recompute each parent tile from its four level-below children
with the band's own reduction kernel and count the disagreeing pixels.

Per parent tile (level L+1, TX, TY): assemble the 512x512 child mosaic
C from the level-L tiles (2TX..2TX+1, 2TY..2TY+1) (zeros where a child
is missing — the store's own empty semantics), compute
``downsample(C, 256, 256, var)`` with the engine's type dispatch
(mean / center-pick / mask-OR...), and emit exact integer discrepancy
stats against the stored parent: n_exact, n_within1, maxad, sad.

Scale shape: ONE hash shuffle — children map to the parent key with
pure JVM arithmetic (``shiftright(tile_x, 1)`` — arithmetic shift ==
floor-div for negative tile indices too), parents map to themselves,
and one ``applyInPandas`` over (var, ptx, pty) groups of <= 5 rows does
the pixel work.  No joins, no decode outside the group kernel; at
10^12 tiles this is the same co-keyed single-shuffle class as the
flagship merge itself.  Oracle: sequential replay of BOTH level
mosaics (``replay.merged_canvases_at``) through the identical audit
arithmetic, as a VALUES literal (the ``mosaic_fp`` pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from .focal import TILE_PX
from .registry import register

N_IMG = 24

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType()),
        T.StructField("ptile_x", T.LongType()),
        T.StructField("ptile_y", T.LongType()),
        T.StructField("has_parent", T.IntegerType()),
        T.StructField("n_child", T.IntegerType()),
        T.StructField("n_exact", T.LongType()),
        T.StructField("n_within1", T.LongType()),
        T.StructField("maxad", T.LongType()),
        T.StructField("sad", T.LongType()),
    ]
)


def _audit_stats(
    var: str, parent: np.ndarray | None, children: dict[tuple, np.ndarray]
) -> tuple[int, int, int, int, int]:
    """(has_parent, n_child, n_exact, n_within1, maxad, sad) — shared by
    the distributed kernel and the sequential replay."""
    from .downsample import downsample

    n = TILE_PX
    C = np.zeros((2 * n, 2 * n), np.uint16)
    for (cx, cy), t in children.items():
        C[(1 - cy) * n : (2 - cy) * n, cx * n : (cx + 1) * n] = t
    P = parent if parent is not None else np.zeros((n, n), np.uint16)
    exp = downsample(C, n, n, var).astype(np.int64)
    d = np.abs(P.astype(np.int64) - exp)
    return (
        int(parent is not None),
        len(children),
        int((d == 0).sum()),
        int((d <= 1).sum()),
        int(d.max()),
        int(d.sum()),
    )


def pyramid_audit(tiles: DataFrame, level: int = 0) -> DataFrame:
    """Audit level ``level+1`` tiles against their level-``level``
    children.  ``tiles``: merged tile table with at least those two
    levels (columns var, level, tile_x, tile_y, data)."""
    import pandas as pd

    kids = tiles.filter(F.col("level") == level).select(
        "var",
        F.shiftright("tile_x", 1).alias("ptx"),
        F.shiftright("tile_y", 1).alias("pty"),
        F.lit(0).alias("is_parent"),
        (F.col("tile_x") - 2 * F.shiftright("tile_x", 1)).cast("int").alias("cx"),
        (F.col("tile_y") - 2 * F.shiftright("tile_y", 1)).cast("int").alias("cy"),
        "data",
    )
    parents = tiles.filter(F.col("level") == level + 1).select(
        "var",
        F.col("tile_x").alias("ptx"),
        F.col("tile_y").alias("pty"),
        F.lit(1).alias("is_parent"),
        F.lit(0).cast("int").alias("cx"),
        F.lit(0).cast("int").alias("cy"),
        "data",
    )

    def kern(key, pdf):
        var, ptx, pty = key
        parent, children = None, {}
        for row in pdf.itertuples(index=False):
            t = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
            if row.is_parent:
                parent = t
            else:
                children[(int(row.cx), int(row.cy))] = t
        hp, nc, ne, nw, mx, sd = _audit_stats(var, parent, children)
        return pd.DataFrame(
            [
                {
                    "var": var,
                    "ptile_x": int(ptx),
                    "ptile_y": int(pty),
                    "has_parent": hp,
                    "n_child": nc,
                    "n_exact": ne,
                    "n_within1": nw,
                    "maxad": mx,
                    "sad": sd,
                }
            ]
        )

    return (
        kids.unionByName(parents)
        .groupBy("var", "ptx", "pty")
        .applyInPandas(kern, _OUT_SCHEMA)
    )


def audit_replay(n_images: int, level: int = 0):
    """Sequential audit rows over the replayed level mosaics."""
    from . import replay

    kids = replay.merged_canvases_at(n_images, level)
    pars = replay.merged_canvases_at(n_images, level + 1)
    groups: dict[tuple, dict] = {}
    for (var, tx, ty), t in kids.items():
        g = groups.setdefault((var, tx >> 1, ty >> 1), {"p": None, "c": {}})
        g["c"][(tx - 2 * (tx >> 1), ty - 2 * (ty >> 1))] = t
    for (var, tx, ty), t in pars.items():
        groups.setdefault((var, tx, ty), {"p": None, "c": {}})["p"] = t
    rows = []
    for (var, ptx, pty) in sorted(groups):
        g = groups[(var, ptx, pty)]
        rows.append((var, ptx, pty) + _audit_stats(var, g["p"], g["c"]))
    return rows


def _audit_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("ptile_x", "BIGINT"),
            ("ptile_y", "BIGINT"),
            ("has_parent", "INTEGER"),
            ("n_child", "INTEGER"),
            ("n_exact", "BIGINT"),
            ("n_within1", "BIGINT"),
            ("maxad", "BIGINT"),
            ("sad", "BIGINT"),
        ],
        audit_replay(N_IMG),
    )


@register("pyramid_audit_fp", _audit_oracle)
def pyramid_audit_fp(spark, sf_dir):
    """Level-1-vs-level-0 consistency audit of the 24-image merged
    pyramid — hash-checked against the dual-level sequential replay."""
    from pyspark.sql import functions as F

    from ..sources.images import generate_images_df
    from . import tiling

    images = generate_images_df(spark, N_IMG)
    tiles = tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter(F.col("level") <= 1)
    return pyramid_audit(tiles, level=0)
