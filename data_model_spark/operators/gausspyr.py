"""Gaussian (binomial) pyramid level: 5-tap smooth + 2x decimate.

The reference's overview levels are block means (A1-A11); production
visual pyramids (GDAL ``GAUSS`` resampling, OpenCV ``pyrDown``) instead
smooth with the separable binomial kernel {1, 4, 6, 4, 1}/16 before
decimating — no aliasing on high-frequency content.  This operator
computes that level over the stored tile mosaic with EXACT integer
arithmetic: the 2-D stencil weights sum to 256, the kernel keeps the
256x-scaled numerators as int64 (max 256 * 65535 < 2^25), and the
output fingerprint is bit-identical at any parallelism.

Distributed design: one radius-2 ``halo_exchange`` (the focal/terrain
edge-strip shuffle, strips 2/256 of tile volume), then a vectorized
per-tile NumPy decimation — embarrassingly parallel, each 256x256 tile
yields its 128x128 child independently; at 10^12 images no global
raster ever materializes.

Oracle: sequential replay over the zero-padded bounding-rectangle var
mosaics (``replay.var_mosaic``) — the pad-2 window of the global mosaic
equals the halo canvas exactly (only stored 8-neighbors reach a radius-2
window; the ``coregister`` replay argument), and the identical kernel
yields int64-identical VALUES rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .focal import TILE_PX, halo_exchange
from .registry import register
from .upsample import _CK_MOD, _CK_MUL

N_IMG = 24  # the hydrology/threshold/coregister merged-mosaic fixture
_W = np.array([1, 4, 6, 4, 1], dtype=np.int64)
PAD = 2


def pyrdown_kernel(canvas: np.ndarray) -> np.ndarray:
    """(n/2, n/2) int64 of 256x-scaled binomial-filtered decimations.

    ``canvas``: (n+4)^2 int64 padded tile (2-px halo, zeros outside the
    stored mosaic).  out[i, j] = sum_{a,b in -2..2} W[a] W[b]
    core[2i+a, 2j+b] — the separable pass runs vertically then
    horizontally, decimating at even core samples.
    """
    n = canvas.shape[0] - 2 * PAD
    # vertical pass at the decimated rows only: rows 2i (core coords)
    rows = np.arange(0, n, 2) + PAD  # canvas row of each output row
    v = sum(_W[k] * canvas[rows + (k - 2), :] for k in range(5))
    cols = np.arange(0, n, 2) + PAD
    out = sum(_W[k] * v[:, cols + (k - 2)] for k in range(5))
    return out


def _fingerprint(out256: np.ndarray) -> dict:
    flat = out256.ravel()
    idx = np.arange(flat.size, dtype=np.int64)
    wts = (idx * _CK_MUL) % _CK_MOD
    return {
        "sum256": int(flat.sum()),
        "min256": int(flat.min()),
        "max256": int(flat.max()),
        "ck256": int((flat * wts).sum()),
    }


_OUT_FIELDS = [
    T.StructField("sum256", T.LongType()),
    T.StructField("min256", T.LongType()),
    T.StructField("max256", T.LongType()),
    T.StructField("ck256", T.LongType()),
]


def pyrdown_tiles(tiles: DataFrame) -> DataFrame:
    """Per stored tile: the fingerprint of its 128x128 binomial child
    (one radius-2 halo shuffle, then map-only)."""

    def compute(P: np.ndarray, n_halo: int) -> dict:
        return _fingerprint(pyrdown_kernel(P))

    return halo_exchange(tiles, radius=PAD, compute=compute, out_fields=_OUT_FIELDS)


def _gauss_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var in replay.mosaic_vars(cv):
        G, tiles, origin = replay.var_mosaic(cv, var)
        Gp = np.pad(G.astype(np.int64), PAD)
        tx_min, ty_max = origin
        for tx, ty in sorted(tiles):
            r0, c0 = (ty_max - ty) * TILE_PX, (tx - tx_min) * TILE_PX
            window = Gp[
                r0 : r0 + TILE_PX + 2 * PAD, c0 : c0 + TILE_PX + 2 * PAD
            ]
            fp = _fingerprint(pyrdown_kernel(window))
            rows.append(
                (var, tx, ty, fp["sum256"], fp["min256"], fp["max256"], fp["ck256"])
            )
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("sum256", "BIGINT"),
            ("min256", "BIGINT"),
            ("max256", "BIGINT"),
            ("ck256", "BIGINT"),
        ],
        rows,
    )


@register("gauss_pyramid_fp", _gauss_oracle)
def gauss_pyramid_fp(spark, sf_dir):
    """Binomial-filter pyramid children of the 24-image merged mosaic —
    hash-checked against the padded-global-mosaic replay."""
    from .hydrology import _merged_tiles

    out = pyrdown_tiles(_merged_tiles(spark))
    return out.select(
        "var", "tile_x", "tile_y", "sum256", "min256", "max256", "ck256"
    )
