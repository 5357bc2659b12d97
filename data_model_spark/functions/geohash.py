"""Geohash encode/decode — the standard public interop cell scheme.

The engine's native cell ids (``functions/cells.py``) are int64-packed
(res, x, y) grid indices; external geospatial systems exchange base32
geohashes (Niemeyer 2008, as documented publicly).  This module provides
both directions as pure JVM column expressions (shift/mask chains inside
whole-stage codegen — no UDF) plus a NumPy reference and a DuckDB SQL
twin for oracles.

Bit layout (the public definition): 5 bits per character; bits alternate
longitude-first from the most significant bit, so ``precision`` chars
use ceil(5p/2) longitude bits and floor(5p/2) latitude bits.  The grid
index of each axis is the floor of the unit fraction scaled by 2^bits —
identical to the reference bisection algorithm, because bisection digits
ARE the binary digits of the fraction.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_counts(precision: int) -> tuple[int, int]:
    total = 5 * precision
    return (total + 1) // 2, total // 2  # lon, lat


def geohash_col(lon, lat, precision: int = 7) -> Column:
    """Geohash string of (lon, lat) as a JVM expression."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    bx, by = _bit_counts(precision)
    nx, ny = 1 << bx, 1 << by
    x = F.least(
        F.floor((F.col(lon) + 180.0) / 360.0 * nx), F.lit(nx - 1)
    ).cast("long")
    y = F.least(
        F.floor((F.col(lat) + 90.0) / 180.0 * ny), F.lit(ny - 1)
    ).cast("long")
    total = 5 * precision
    code = F.lit(0).cast("long")
    for j in range(bx):  # lon bit j-from-MSB -> code bit (total-1-2j)
        code = code.bitwiseOR(
            F.shiftleft(
                F.shiftright(x, bx - 1 - j).bitwiseAND(F.lit(1)),
                total - 1 - 2 * j,
            )
        )
    for j in range(by):
        code = code.bitwiseOR(
            F.shiftleft(
                F.shiftright(y, by - 1 - j).bitwiseAND(F.lit(1)),
                total - 2 - 2 * j,
            )
        )
    chars = [
        F.substring(
            F.lit(BASE32),
            (
                F.shiftright(code, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31))
                + 1
            ).cast("int"),
            1,
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_decode_cols(gh, precision: int) -> tuple[Column, Column]:
    """(lon_center, lat_center) of a geohash column (fixed precision)."""
    bx, by = _bit_counts(precision)
    code = F.lit(0).cast("long")
    for k in range(precision):
        idx = (F.instr(F.lit(BASE32), F.substring(F.col(gh), k + 1, 1)) - 1).cast(
            "long"
        )
        code = code.bitwiseOR(F.shiftleft(idx, 5 * (precision - 1 - k)))
    total = 5 * precision
    x = F.lit(0).cast("long")
    y = F.lit(0).cast("long")
    for j in range(bx):
        x = x.bitwiseOR(
            F.shiftleft(
                F.shiftright(code, total - 1 - 2 * j).bitwiseAND(F.lit(1)),
                bx - 1 - j,
            )
        )
    for j in range(by):
        y = y.bitwiseOR(
            F.shiftleft(
                F.shiftright(code, total - 2 - 2 * j).bitwiseAND(F.lit(1)),
                by - 1 - j,
            )
        )
    lon = (x.cast("double") + 0.5) / (1 << bx) * 360.0 - 180.0
    lat = (y.cast("double") + 0.5) / (1 << by) * 180.0 - 90.0
    return lon, lat


def geohash_np(lon, lat, precision: int = 7) -> np.ndarray:
    """NumPy reference encoder (same formulas, vectorized)."""
    bx, by = _bit_counts(precision)
    nx, ny = 1 << bx, 1 << by
    x = np.minimum(
        np.floor((np.asarray(lon, np.float64) + 180.0) / 360.0 * nx), nx - 1
    ).astype(np.int64)
    y = np.minimum(
        np.floor((np.asarray(lat, np.float64) + 90.0) / 180.0 * ny), ny - 1
    ).astype(np.int64)
    total = 5 * precision
    code = np.zeros_like(x)
    for j in range(bx):
        code |= ((x >> (bx - 1 - j)) & 1) << (total - 1 - 2 * j)
    for j in range(by):
        code |= ((y >> (by - 1 - j)) & 1) << (total - 2 - 2 * j)
    out = []
    for c in code:
        out.append(
            "".join(
                BASE32[(int(c) >> (5 * (precision - 1 - k))) & 31]
                for k in range(precision)
            )
        )
    return np.array(out)


def geohash_sql(lon_expr: str, lat_expr: str, precision: int = 7) -> str:
    """DuckDB SQL replaying the identical shift/mask construction."""
    bx, by = _bit_counts(precision)
    nx, ny = 1 << bx, 1 << by
    total = 5 * precision
    x = f"CAST(least(floor(({lon_expr} + 180.0) / 360.0 * {nx}), {nx - 1}) AS BIGINT)"
    y = f"CAST(least(floor(({lat_expr} + 90.0) / 180.0 * {ny}), {ny - 1}) AS BIGINT)"
    terms = [
        f"((({x} >> {bx - 1 - j}) & 1) << {total - 1 - 2 * j})" for j in range(bx)
    ] + [
        f"((({y} >> {by - 1 - j}) & 1) << {total - 2 - 2 * j})" for j in range(by)
    ]
    code = " | ".join(terms)
    chars = " || ".join(
        f"substring('{BASE32}', CAST((({code}) >> {5 * (precision - 1 - k)}) "
        f"& 31 AS INTEGER) + 1, 1)"
        for k in range(precision)
    )
    return chars
