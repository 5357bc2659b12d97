"""Exact squared Euclidean distance transform (EDT) per tile.

Distance-to-feature maps drive buffer zones ("within 500 m of water"),
shoreline/edge proximity weighting, and mask-aware sampling (training
crops biased away from label boundaries).  Chamfer passes are only
approximate; this computes the EXACT squared EDT by the published
row/column decomposition (Meijster et al. 2000 / Felzenszwalb-
Huttenlocher):

    D2(x, y) = min over y' of  g(x, y')^2 + (y - y')^2

where ``g(x, y')`` is the 1D distance from column x to the nearest
feature pixel within row y' (forward/backward running extrema —
vectorized), and the outer min runs as one (y, y', x) broadcast
min-reduction — all integer, no per-pixel Python loop.  Feature mask
is the same integer threshold family as the stencil suite.

Scale shape: tile-local (no halo: the fixture guarantees features in
every tile; a global EDT would run the same kernel over halo-padded
tiles like `focal.py`), so one map-only ``mapInPandas``, zero shuffle.
Emits per-tile integer fingerprints (feature count, max D2, positional
checksum) — bit-identical at any parallelism.  Oracle: direct-kernel
replay VALUES (the ``mosaic_fp`` pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..codecs import decode_image
from .focal import TILE_PX
from .registry import register
from .upsample import _CK_MOD, _CK_MUL

N_IMG = 24
MASK_T = 2000  # feature = pixel value > T (the stripe/hough family)
G_CAP = 1000  # 1D distance cap for feature-free rows (g^2 fits int32)


def sq_edt(mask: np.ndarray) -> np.ndarray:
    """Exact squared EDT of ``~mask`` to the nearest True pixel (int32).

    Rows with no feature contribute the G_CAP sentinel; if the whole
    tile is empty every distance is the capped sentinel value.
    """
    h, w = mask.shape
    cols = np.arange(w, dtype=np.int64)[None, :]
    # nearest feature column to the left / right within each row
    left = np.maximum.accumulate(np.where(mask, cols, -G_CAP), axis=1)
    right = np.minimum.accumulate(
        np.where(mask, cols, 3 * G_CAP)[:, ::-1], axis=1
    )[:, ::-1]
    g = np.minimum(cols - left, right - cols)
    g = np.minimum(g, G_CAP).astype(np.int32)
    rows = np.arange(h, dtype=np.int32)
    offs = (rows[:, None] - rows[None, :]) ** 2  # (y, y')
    # D2[y, x] = min over y' of offs[y, y'] + g2[y', x]
    return (offs[:, :, None] + (g.astype(np.int32) ** 2)[None, :, :]).min(axis=1)


def edt_features(tile: np.ndarray) -> tuple[int, int, int]:
    """(n_feature, max_d2, ck) of one tile."""
    mask = tile.astype(np.int64) > MASK_T
    d2 = sq_edt(mask).astype(np.int64)
    idx = np.arange(d2.size, dtype=np.int64)
    ck = int(((d2.ravel() % _CK_MOD) * ((idx * _CK_MUL) % _CK_MOD) % _CK_MOD).sum() % _CK_MOD)
    return int(mask.sum()), int(d2.max()), ck


def edt_tiles(tiles: DataFrame) -> DataFrame:
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                t = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                n, mx, ck = edt_features(t)
                recs.append(
                    {
                        "var": row.var,
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_feature": n,
                        "max_d2": mx,
                        "ck": ck,
                    }
                )
            cols = ["var", "tile_x", "tile_y", "n_feature", "max_d2", "ck"]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        kern,
        "var string, tile_x long, tile_y long, n_feature long, "
        "max_d2 long, ck long",
    )


def _edt_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var, tx, ty in sorted(cv):
        n, mx, ck = edt_features(cv[(var, tx, ty)])
        rows.append((var, tx, ty, n, mx, ck))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_feature", "BIGINT"),
            ("max_d2", "BIGINT"),
            ("ck", "BIGINT"),
        ],
        rows,
    )


@register("edt_fp", _edt_oracle)
def edt_fp(spark, sf_dir):
    """Exact squared-EDT fingerprints of every merged-mosaic tile —
    hash-checked against the sequential direct-kernel replay."""
    from .hydrology import _merged_tiles

    return edt_tiles(_merged_tiles(spark))
