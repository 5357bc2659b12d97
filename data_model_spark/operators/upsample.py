"""Bilinear 2x overzoom: render one pyramid level FINER than stored.

Tile servers routinely serve zoom levels beyond the finest stored
GeoZarr level by upsampling the finest stored tiles ("overzoom") —
the complement of the reference's block-mean downsampling family
(``src/eopf_geozarr/conversion/geozarr.py`` overview levels; our
A1-A11 suite).  Each stored 256x256 tile becomes a 512x512 tile of the
child level, sampled at half-pixel centers with the standard separable
bilinear stencil

    out[2i+a, 2j+b] = sum of the 2x2 input neighborhood with weights
                      {9, 3, 3, 1} / 16   (a, b in {0, 1})

which needs ONE ring of neighbor pixels across tile boundaries — the
same O(perimeter) halo exchange as ``focal_stats`` (radius 1, strips
are 1/256 of the tile volume), so at 10^12 images the plan is one
edge-strip shuffle plus an embarrassingly parallel per-tile kernel and
never materializes a global raster.

Exactness: the kernel keeps the x16-scaled numerators as int64 (max
16 * 65535 < 2^20 per pixel — no division, no doubles), so the
fingerprint is bit-identical at any parallelism and the DuckDB oracle
is a sequential replay over the identical padded canvases
(``replay.padded``), the ``mosaic_fp`` pattern.  Zeros outside the
stored mosaic are the halo-canvas semantics on both sides.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .focal import TILE_PX, halo_exchange
from .registry import register

N_IMG = 24  # the hydrology/threshold/coregister merged-mosaic fixture

# position-weight modulus for the order-insensitive positional checksum
_CK_MOD = 1000003
_CK_MUL = 2654435761  # Knuth multiplicative hash


def upsample2x_kernel(canvas: np.ndarray) -> np.ndarray:
    """(2n, 2n) int64 of 16x-scaled bilinear samples of the n x n core.

    ``canvas``: (n+2)^2 int64 padded tile (1-px halo, zeros outside the
    stored mosaic).  Output pixel (2i+a, 2j+b) samples input coordinate
    (i + a/2 - 1/4, j + b/2 - 1/4): even outputs lean on the previous
    row/col with weight 1/4, odd outputs on the next with weight 1/4.
    """
    n = canvas.shape[0] - 2
    core = canvas[1 : 1 + n, 1 : 1 + n]
    up = canvas[0:n, 1 : 1 + n]  # row above each core row
    dn = canvas[2 : 2 + n, 1 : 1 + n]  # row below
    # vertical pass: 4x-scaled rows interleaved even/odd
    v = np.empty((2 * n, n), np.int64)
    v[0::2] = 3 * core + up
    v[1::2] = 3 * core + dn
    # horizontal pass needs the halo columns at the same doubled rows
    lcol = canvas[:, 0]
    rcol = canvas[:, n + 1]
    vl = np.empty((2 * n,), np.int64)
    vl[0::2] = 3 * lcol[1 : 1 + n] + lcol[0:n]
    vl[1::2] = 3 * lcol[1 : 1 + n] + lcol[2 : 2 + n]
    vr = np.empty((2 * n,), np.int64)
    vr[0::2] = 3 * rcol[1 : 1 + n] + rcol[0:n]
    vr[1::2] = 3 * rcol[1 : 1 + n] + rcol[2 : 2 + n]
    out = np.empty((2 * n, 2 * n), np.int64)
    left = np.concatenate([vl[:, None], v[:, :-1]], axis=1)
    right = np.concatenate([v[:, 1:], vr[:, None]], axis=1)
    out[:, 0::2] = 3 * v + left
    out[:, 1::2] = 3 * v + right
    return out


def _fingerprint(out16: np.ndarray) -> dict:
    flat = out16.ravel()
    idx = np.arange(flat.size, dtype=np.int64)
    wts = (idx * _CK_MUL) % _CK_MOD
    return {
        "sum16": int(flat.sum()),
        "min16": int(flat.min()),
        "max16": int(flat.max()),
        "ck16": int((flat * wts).sum()),
    }


_OUT_FIELDS = [
    T.StructField("sum16", T.LongType()),
    T.StructField("min16", T.LongType()),
    T.StructField("max16", T.LongType()),
    T.StructField("ck16", T.LongType()),
]


def overzoom_tiles(tiles: DataFrame) -> DataFrame:
    """Per stored tile: the int64 fingerprint of its 512x512 bilinear
    child tile (one radius-1 halo shuffle, then map-only)."""

    def compute(P: np.ndarray, n_halo: int) -> dict:
        return _fingerprint(upsample2x_kernel(P))

    return halo_exchange(tiles, radius=1, compute=compute, out_fields=_OUT_FIELDS)


def _overzoom_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var, tx, ty in sorted(cv):
        fp = _fingerprint(upsample2x_kernel(replay.padded(cv, var, tx, ty)))
        rows.append(
            (var, tx, ty, fp["sum16"], fp["min16"], fp["max16"], fp["ck16"])
        )
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("sum16", "BIGINT"),
            ("min16", "BIGINT"),
            ("max16", "BIGINT"),
            ("ck16", "BIGINT"),
        ],
        rows,
    )


@register("overzoom_fp", _overzoom_oracle)
def overzoom_fp(spark, sf_dir):
    """Bilinear 2x overzoom fingerprints of the 24-image merged mosaic —
    hash-checked against the sequential padded-canvas replay."""
    from .hydrology import _merged_tiles

    out = overzoom_tiles(_merged_tiles(spark))
    return out.select("var", "tile_x", "tile_y", "sum16", "min16", "max16", "ck16")


# ---------------------------------------------------------------------------
# Bicubic (Keys, a = -1/2) 2x overzoom — the quality tier above bilinear
# ---------------------------------------------------------------------------
# Cubic convolution (Keys 1981) at the same half-pixel sample offsets
# +-1/4 has EXACT fixed-point taps in 1/128 units (each sums to 128):
#
#     x = i - 1/4 -> taps [i-2, i-1, i, i+1] * (-3, 29, 111, -9) / 128
#     x = i + 1/4 -> taps [i-1, i, i+1, i+2] * (-9, 111, 29, -3) / 128
#
# so the separable two-pass kernel keeps 16384x-scaled int64 numerators
# end-to-end: |v| <= 65535 * 152, |out| <= 65535 * 152^2 ~ 1.5e9 — no
# doubles, bit-identical at any parallelism.  Needs a RADIUS-2 halo
# (4-tap support), i.e. the same O(perimeter) strip shuffle as
# ``focal_stats(radius=2)``; the sequential replay pads the var's
# global mosaic (``replay.var_mosaic``) with a 2-px zero ring, which is
# exactly ``halo_exchange``'s zeros-outside-the-stored-mosaic
# semantics.  The positional checksum uses the chunked-mod reduction
# (``harris.ck_mod``) because 16384-scale values overflow the plain
# int64 dot product ``_fingerprint`` uses at 16x scale.


def bicubic2x_kernel(canvas: np.ndarray) -> np.ndarray:
    """(2n, 2n) int64 of 16384x-scaled bicubic samples of the n x n core.

    ``canvas``: (n+4)^2 int64 padded tile (2-px halo, zeros outside the
    stored mosaic).  Core row/col ``i`` lives at canvas index ``i + 2``.
    """
    n = canvas.shape[0] - 4
    A = canvas.astype(np.int64)
    r0, r1, r2, r3, r4 = A[0:n], A[1 : n + 1], A[2 : n + 2], A[3 : n + 3], A[4 : n + 4]
    v = np.empty((2 * n, canvas.shape[1]), np.int64)
    v[0::2] = -3 * r0 + 29 * r1 + 111 * r2 - 9 * r3
    v[1::2] = -9 * r1 + 111 * r2 + 29 * r3 - 3 * r4
    c0, c1, c2, c3, c4 = (
        v[:, 0:n], v[:, 1 : n + 1], v[:, 2 : n + 2], v[:, 3 : n + 3], v[:, 4 : n + 4]
    )
    out = np.empty((2 * n, 2 * n), np.int64)
    out[:, 0::2] = -3 * c0 + 29 * c1 + 111 * c2 - 9 * c3
    out[:, 1::2] = -9 * c1 + 111 * c2 + 29 * c3 - 3 * c4
    return out


def _fingerprint_q(outq: np.ndarray) -> dict:
    from .harris import ck_mod

    flat = outq.ravel()
    return {
        "sumq": int(flat.sum()),
        "minq": int(flat.min()),
        "maxq": int(flat.max()),
        "ckq": ck_mod(flat),
    }


_OUT_FIELDS_Q = [
    T.StructField("sumq", T.LongType()),
    T.StructField("minq", T.LongType()),
    T.StructField("maxq", T.LongType()),
    T.StructField("ckq", T.LongType()),
]


def bicubic_overzoom_tiles(tiles: DataFrame) -> DataFrame:
    """Per stored tile: the int64 fingerprint of its 512x512 bicubic
    child tile (one radius-2 halo shuffle, then map-only)."""

    def compute(P: np.ndarray, n_halo: int) -> dict:
        return _fingerprint_q(bicubic2x_kernel(P))

    return halo_exchange(tiles, radius=2, compute=compute, out_fields=_OUT_FIELDS_Q)


def _bicubic_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var in replay.mosaic_vars(cv):
        G, tiles, origin = replay.var_mosaic(cv, var)
        Gp = np.pad(G.astype(np.int64), 2)
        tx_min, ty_max = origin
        for tx, ty in sorted(tiles):
            r0 = (ty_max - ty) * 256
            c0 = (tx - tx_min) * 256
            P = Gp[r0 : r0 + 260, c0 : c0 + 260]
            fp = _fingerprint_q(bicubic2x_kernel(P))
            rows.append(
                (var, tx, ty, fp["sumq"], fp["minq"], fp["maxq"], fp["ckq"])
            )
    rows.sort()
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("sumq", "BIGINT"),
            ("minq", "BIGINT"),
            ("maxq", "BIGINT"),
            ("ckq", "BIGINT"),
        ],
        rows,
    )


@register("bicubic_overzoom_fp", _bicubic_oracle)
def bicubic_overzoom_fp(spark, sf_dir):
    """Bicubic 2x overzoom fingerprints of the 24-image merged mosaic —
    hash-checked against the global-mosaic sequential replay."""
    from .hydrology import _merged_tiles

    out = bicubic_overzoom_tiles(_merged_tiles(spark))
    return out.select("var", "tile_x", "tile_y", "sumq", "minq", "maxq", "ckq")
