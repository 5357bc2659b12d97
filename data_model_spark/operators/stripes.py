"""Sensor stripe / column-noise QA over the tile mosaic.

Push-broom sensors produce column striping (mis-calibrated detector
columns); the standard screen flags columns whose response deviates
from their neighbors.  Per tile this operator computes the exact
integer column sums and their second difference

    d_c = 2 * s_c - s_{c-1} - s_{c+1}        (interior columns)

and flags |d_c| > T — a pure integer stencil along the column axis, so
no halo is needed (the statistic is column-local within the tile) and
the result is bit-identical at any parallelism.  Emits per-tile counts,
the max |d|, and a positional checksum of the flagged column set.

Scale shape: one map-only ``mapInPandas`` over the scan (vectorized
sums, no Python loop over pixels), zero shuffle — the cheapest possible
plan at 10^12 tiles.  Oracle: direct-kernel replay VALUES (the
``mosaic_fp`` pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..codecs import decode_image
from .focal import TILE_PX
from .registry import register
from .upsample import _CK_MOD, _CK_MUL

N_IMG = 24
THRESH = 60_000  # |second difference| of int column sums (256 rows)


def stripe_features(tile: np.ndarray) -> tuple[int, int, int]:
    """(n_flagged, max_absd, ck) of one tile."""
    s = tile.astype(np.int64).sum(axis=0)
    d = 2 * s[1:-1] - s[:-2] - s[2:]
    absd = np.abs(d)
    flagged = np.flatnonzero(absd > THRESH) + 1  # column indices
    ck = int(((flagged * _CK_MUL) % _CK_MOD).sum())
    return int(flagged.size), int(absd.max()) if absd.size else 0, ck


def stripe_tiles(tiles: DataFrame) -> DataFrame:
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                t = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                n, mx, ck = stripe_features(t)
                recs.append(
                    {
                        "var": row.var,
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_flagged": n,
                        "max_absd": mx,
                        "ck": ck,
                    }
                )
            cols = ["var", "tile_x", "tile_y", "n_flagged", "max_absd", "ck"]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        kern,
        "var string, tile_x long, tile_y long, n_flagged long, "
        "max_absd long, ck long",
    )


def _stripe_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var, tx, ty in sorted(cv):
        n, mx, ck = stripe_features(cv[(var, tx, ty)])
        rows.append((var, tx, ty, n, mx, ck))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_flagged", "BIGINT"),
            ("max_absd", "BIGINT"),
            ("ck", "BIGINT"),
        ],
        rows,
    )


@register("stripe_qa_fp", _stripe_oracle)
def stripe_qa_fp(spark, sf_dir):
    """Column-striping QA of every merged-mosaic tile — hash-checked
    against the sequential direct-kernel replay."""
    from .hydrology import _merged_tiles

    return stripe_tiles(_merged_tiles(spark))
