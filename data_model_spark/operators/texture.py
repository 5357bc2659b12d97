"""GLCM texture features per tile: contrast / dissimilarity / energy.

Haralick gray-level co-occurrence features are the standard texture
screen for image curation — flat or near-constant tiles (low contrast,
high energy) and salt-and-pepper noise (high contrast) both get
filtered before training, and EO pipelines use the same features for
cloud/ice/texture classification.  The reference carries no texture
surface; this extends the per-tile QA family (`otsu_mosaic`,
`entropy_gate`) with the second-order statistics the first-order
histogram cannot see.

Per tile: pixels quantize to L=16 gray levels (``v // 320`` over the
0..5000 mosaic domain), the co-occurrence matrix accumulates both the
horizontal (0,1) and vertical (1,0) neighbor offsets WITHIN the tile
(256*255 pairs each — no halo, zero shuffle), and the features are
exact integer sums:

    contrast      = sum n_ij * (i-j)^2
    dissimilarity = sum n_ij * |i-j|
    energy        = sum n_ij^2           (angular second moment)

All int64 (energy <= (2*256*255)^2 < 2^35), so the fingerprint is
bit-identical at any parallelism and the oracle is a sequential
direct-kernel replay (the ``mosaic_fp`` pattern).  At 10^12 tiles the
plan is a single map-only pass over the scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..codecs import decode_image
from .focal import TILE_PX
from .registry import register

N_IMG = 24  # the shared merged-mosaic fixture
LEVELS = 16
BIN = 320  # 0..5119 -> 0..15


def glcm_features(tile: np.ndarray) -> tuple[int, int, int, int]:
    """(n_pairs, contrast, dissim, energy) over both neighbor offsets."""
    q = (tile.astype(np.int64) // BIN).clip(0, LEVELS - 1)
    counts = np.zeros(LEVELS * LEVELS, np.int64)
    for a, b in (
        (q[:, :-1], q[:, 1:]),  # horizontal (0, 1)
        (q[:-1, :], q[1:, :]),  # vertical (1, 0)
    ):
        counts += np.bincount(
            (a * LEVELS + b).ravel(), minlength=LEVELS * LEVELS
        )
    i = np.arange(LEVELS * LEVELS, dtype=np.int64) // LEVELS
    j = np.arange(LEVELS * LEVELS, dtype=np.int64) % LEVELS
    d = np.abs(i - j)
    return (
        int(counts.sum()),
        int((counts * d * d).sum()),
        int((counts * d).sum()),
        int((counts * counts).sum()),
    )


def texture_tiles(tiles: DataFrame) -> DataFrame:
    """(var, tile_x, tile_y, n_pairs, contrast, dissim, energy) — one
    map-only pass, no shuffle."""
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                t = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                n, c, di, en = glcm_features(t)
                recs.append(
                    {
                        "var": row.var,
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_pairs": n,
                        "contrast": c,
                        "dissim": di,
                        "energy": en,
                    }
                )
            cols = ["var", "tile_x", "tile_y", "n_pairs", "contrast", "dissim", "energy"]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        kern,
        "var string, tile_x long, tile_y long, n_pairs long, "
        "contrast long, dissim long, energy long",
    )


def _texture_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var, tx, ty in sorted(cv):
        n, c, di, en = glcm_features(cv[(var, tx, ty)])
        rows.append((var, tx, ty, n, c, di, en))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_pairs", "BIGINT"),
            ("contrast", "BIGINT"),
            ("dissim", "BIGINT"),
            ("energy", "BIGINT"),
        ],
        rows,
    )


@register("glcm_texture_fp", _texture_oracle)
def glcm_texture_fp(spark, sf_dir):
    """GLCM texture features of every merged-mosaic tile — hash-checked
    against the sequential direct-kernel replay."""
    from .hydrology import _merged_tiles

    return texture_tiles(_merged_tiles(spark))
