"""Reconstruction-quality metrics over the tile mosaic: per-tile SSIM + MSE.

The pipeline's lossy paths (JPEG ingestion, pyramid downsampling) are
gated on PSNR (north rule: >= 40 dB for lossy formats; per-bucket PSNR
lineage rows in the validate stage).  SSIM is the complementary
structural metric a production image pipeline reports alongside PSNR —
mean/variance/covariance based, so it catches contrast/structure drift
a pure-MSE gate misses.

This operator scores, per level-0 tile, the 2x block-mean reconstruction
(downsample by 2 with the pyramid's own averaging kernel, upsample by
pixel replication) against the original canvas: the quality loss of one
pyramid step, measured tile-by-tile.  Global (single-window) SSIM with
the standard constants C1=(0.01 L)^2, C2=(0.03 L)^2, L=65535.

Scale shape: one ``mapInPandas`` over the merged-tile stream — Arrow
batches, vectorized NumPy per tile, no shuffle beyond the merge the
tiles already required.  Driver check: the kernel is replayed
sequentially on the ``operators/replay.py`` canvases (the proven
placement replay) into a DuckDB VALUES literal — the ``zonal_stats_fp``
pattern — so SSIM/MSE values are hash-matched bit-for-bit, with doubles
rounded HALF_UP on their shortest decimal repr in both paths.
"""

from __future__ import annotations

import numpy as np

from .registry import register

L_MAX = 65535.0
_C1 = (0.01 * L_MAX) ** 2
_C2 = (0.03 * L_MAX) ** 2


def reconstruct_2x(A: np.ndarray) -> np.ndarray:
    """Block-2x2-mean downsample then pixel-replication upsample (float64)."""
    h, w = A.shape
    B = A.astype(np.float64).reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    return np.repeat(np.repeat(B, 2, axis=0), 2, axis=1)


def ssim_mse(A: np.ndarray) -> tuple[float, float]:
    """(ssim, mse) of the 2x reconstruction vs the uint16 canvas ``A``.

    Single deterministic NumPy reduction order — the executor UDF and the
    sequential oracle replay call THIS function on identical arrays, so
    the doubles agree bit-for-bit.
    """
    X = A.astype(np.float64)
    Y = reconstruct_2x(A)
    mu_x, mu_y = X.mean(), Y.mean()
    var_x, var_y = X.var(), Y.var()
    cov = ((X - mu_x) * (Y - mu_y)).mean()
    ssim = ((2 * mu_x * mu_y + _C1) * (2 * cov + _C2)) / (
        (mu_x * mu_x + mu_y * mu_y + _C1) * (var_x + var_y + _C2)
    )
    mse = ((X - Y) ** 2).mean()
    return float(ssim), float(mse)


def ssim_tiles(tiles):
    """Per-tile (ssim, mse) of the one-pyramid-step reconstruction."""
    from .mosaic_fp import _r
    from .tiling import TILE_PX

    def score(batches):
        import pandas as pd

        from ..codecs import decode_image

        for pdf in batches:
            rows = []
            for var, tx, ty, b in zip(
                pdf["var"], pdf["tile_x"], pdf["tile_y"], pdf["data"]
            ):
                A = decode_image(b, "raw-u16", TILE_PX, TILE_PX)
                s, m = ssim_mse(A)
                rows.append((var, int(tx), int(ty), _r(s, 9), _r(m, 6)))
            yield pd.DataFrame(
                rows, columns=["var", "tile_x", "tile_y", "ssim", "mse"]
            )

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        score, "var string, tile_x long, tile_y long, ssim double, mse double"
    )


def _ssim_oracle() -> str:
    from . import replay
    from .mosaic_fp import _MOSAIC_N, _r, _values_sql

    cv = replay.merged_canvases(_MOSAIC_N)
    rows = []
    for (var, tx, ty), A in sorted(cv.items()):
        s, m = ssim_mse(A)
        rows.append((var, tx, ty, _r(s, 9), _r(m, 6)))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("ssim", "DOUBLE"),
            ("mse", "DOUBLE"),
        ],
        rows,
    )


@register("ssim_tiles_fp", _ssim_oracle)
def ssim_tiles_fp(spark, sf_dir):
    """Per-tile SSIM/MSE of the pyramid-step reconstruction over the merged
    level-0 mosaic, hash-checked against the sequential kernel replay."""
    from .hydrology import _merged_tiles

    return ssim_tiles(_merged_tiles(spark))
