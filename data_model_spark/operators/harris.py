"""Harris corner response per tile — the keypoint-density screen.

Harris & Stephens 1988: corners are pixels where the structure tensor
``S = sum_w [gx^2 gxgy; gxgy gy^2]`` has two large eigenvalues, scored
by ``R = det(S) - k * trace(S)^2``.  In EO curation this screens tiles
for texture richness (keypoint density drives co-registration quality
— `coregister.py` needs structure to lock onto); over a web image
corpus it is the synthetic/flat-image detector (screenshots and
gradients have near-zero corner mass, photographs have thousands).

Exact integer pipeline (u16 mosaic tiles): Sobel gradients on the tile
interior (no halo — the interior stencil convention of ``hough.py``),
down-shifted 4 bits so every later product stays in int64:

    |gx|, |gy| <= 4*65535 >> 4 = 16383
    products   <= 2.7e8 ; 3x3 box sums S* <= 2.4e9
    det = Sxx*Syy - Sxy^2            |det| <= 5.8e18  < 2^63
    q   = (Sxx + Syy) >> 2  (k=1/16 fixed-point: q^2 <= 1.45e18)
    R   = det - q*q

``R`` is a deterministic integer for every pixel, so the per-tile
outputs (strong-corner count, first-argmax peak position + response,
and a chunked-mod positional checksum of the full response plane) are
bit-identical at any parallelism and replayable sequentially.

Scale shape: one map-only ``mapInPandas`` over the tile scan — zero
shuffle, one row per tile, the cheapest possible plan at 10^12 tiles.
Oracle: direct-kernel replay VALUES (the ``mosaic_fp`` pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..codecs import decode_image
from .focal import TILE_PX
from .registry import register

N_IMG = 24
# "strong corner" threshold, calibrated on the merged-mosaic fixture:
# per-tile counts span 0..~1600 (median ~450) — non-vacuous and
# tile-discriminating, the r3 lesson about planted-signal fixtures
R_THRESH = 10**11

# chunked-mod positional checksum (int64-safe for |x| < 2^62 inputs)
_CK_P = 2_147_483_629  # prime < 2^31
_CK_MUL = 2654435761
_CK_WMOD = 1000003


def ck_mod(flat: np.ndarray) -> int:
    """Order-sensitive checksum of an int64 vector, no int64 overflow.

    ``(x % P) * w`` <= 2.1e9 * 1e6 ~ 2.1e15; chunks of 2048 sum to
    <= 4.4e18 < 2^63; chunk remainders then sum in Python ints.
    """
    idx = np.arange(flat.size, dtype=np.int64)
    w = (idx * _CK_MUL) % _CK_WMOD
    s = (flat % _CK_P) * w
    total = 0
    for i in range(0, s.size, 2048):
        total += int(s[i : i + 2048].sum() % _CK_P)
    return total % _CK_P


def harris_response(tile: np.ndarray) -> np.ndarray:
    """(n-4, n-4) int64 response plane of the tile interior."""
    t = tile.astype(np.int64)
    # Sobel on the interior (valid at rows/cols 1..n-2)
    gx = (
        (t[:-2, 2:] + 2 * t[1:-1, 2:] + t[2:, 2:])
        - (t[:-2, :-2] + 2 * t[1:-1, :-2] + t[2:, :-2])
    ) >> 4
    gy = (
        (t[2:, :-2] + 2 * t[2:, 1:-1] + t[2:, 2:])
        - (t[:-2, :-2] + 2 * t[:-2, 1:-1] + t[:-2, 2:])
    ) >> 4
    pxx, pyy, pxy = gx * gx, gy * gy, gx * gy

    def box3(a):
        v = a[:-2] + a[1:-1] + a[2:]
        return v[:, :-2] + v[:, 1:-1] + v[:, 2:]

    sxx, syy, sxy = box3(pxx), box3(pyy), box3(pxy)
    q = (sxx + syy) >> 2
    return sxx * syy - sxy * sxy - q * q


def harris_features(tile: np.ndarray) -> tuple[int, int, int, int, int]:
    """(n_strong, peak_y, peak_x, peak_r, ck_r) of one tile.

    peak_y/peak_x are FULL-TILE pixel coordinates (interior offset +2);
    first flat argmax breaks ties deterministically.
    """
    R = harris_response(tile)
    best = int(np.argmax(R))
    h = R.shape[1]
    return (
        int((R > R_THRESH).sum()),
        best // h + 2,
        best % h + 2,
        int(R.ravel()[best]),
        ck_mod(R.ravel()),
    )


def harris_tiles(tiles: DataFrame) -> DataFrame:
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                t = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                n, py, px, pr, ck = harris_features(t)
                recs.append(
                    {
                        "var": row.var,
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_strong": n,
                        "peak_y": py,
                        "peak_x": px,
                        "peak_r": pr,
                        "ck_r": ck,
                    }
                )
            cols = [
                "var", "tile_x", "tile_y",
                "n_strong", "peak_y", "peak_x", "peak_r", "ck_r",
            ]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        kern,
        "var string, tile_x long, tile_y long, n_strong long, "
        "peak_y long, peak_x long, peak_r long, ck_r long",
    )


def _harris_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var, tx, ty in sorted(cv):
        n, py, px, pr, ck = harris_features(cv[(var, tx, ty)])
        rows.append((var, tx, ty, n, py, px, pr, ck))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_strong", "BIGINT"),
            ("peak_y", "BIGINT"),
            ("peak_x", "BIGINT"),
            ("peak_r", "BIGINT"),
            ("ck_r", "BIGINT"),
        ],
        rows,
    )


@register("harris_fp", _harris_oracle)
def harris_fp(spark, sf_dir):
    """Harris corner-response fingerprints of every merged-mosaic tile —
    hash-checked against the sequential direct-kernel replay."""
    from .hydrology import _merged_tiles

    return harris_tiles(_merged_tiles(spark))
