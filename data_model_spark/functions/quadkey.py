"""Quadkey (WebMercator tile key) encode/decode — public interop format.

Quadkeys address z/x/y WebMercator tiles as base-4 strings (one digit
per zoom level, MSB first, digit = 2*y_bit + x_bit) — the scheme Bing
Maps documents publicly and titiler-style consumers accept next to
z/x/y.  Pairs with ``operators/render.py`` (which serves those tiles)
the way ``functions/geohash.py`` pairs with the lat/lon cell grid.

Everything is a JVM shift/mask column expression with a DuckDB SQL twin;
the WebMercator point->tile formula matches ``render.mercator_tile_for``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F


def mercator_tile_cols(lon, lat, zoom: int) -> tuple[Column, Column]:
    """(tile_x, tile_y) of each WGS84 point at ``zoom`` (JVM exprs)."""
    n = 1 << zoom
    tx = F.floor((F.col(lon) + 180.0) / 360.0 * n)
    rad = F.radians(F.col(lat))
    ty = F.floor(
        (1.0 - F.log(F.tan(rad) + 1.0 / F.cos(rad)) / float(np.pi)) / 2.0 * n
    )
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(n - 1)).cast("long")
    return clamp(tx), clamp(ty)


def quadkey_col(tx: Column, ty: Column, zoom: int) -> Column:
    """Quadkey string of integer tile columns at ``zoom``."""
    if not 1 <= zoom <= 28:
        raise ValueError("zoom must be in [1, 28]")
    digits = [
        F.substring(
            F.lit("0123"),
            (
                F.shiftleft(
                    F.shiftright(ty, zoom - 1 - k).bitwiseAND(F.lit(1)), 1
                )
                + F.shiftright(tx, zoom - 1 - k).bitwiseAND(F.lit(1))
                + 1
            ).cast("int"),
            1,
        )
        for k in range(zoom)
    ]
    return F.concat(*digits)


def quadkey_decode_cols(qk, zoom: int) -> tuple[Column, Column]:
    """(tile_x, tile_y) back from a quadkey column of fixed ``zoom``."""
    tx = F.lit(0).cast("long")
    ty = F.lit(0).cast("long")
    for k in range(zoom):
        d = (F.instr(F.lit("0123"), F.substring(F.col(qk), k + 1, 1)) - 1).cast(
            "long"
        )
        tx = tx.bitwiseOR(F.shiftleft(d.bitwiseAND(F.lit(1)), zoom - 1 - k))
        ty = ty.bitwiseOR(
            F.shiftleft(F.shiftright(d, 1).bitwiseAND(F.lit(1)), zoom - 1 - k)
        )
    return tx, ty


def quadkey_np(tx, ty, zoom: int) -> np.ndarray:
    """NumPy reference encoder."""
    tx = np.asarray(tx, np.int64)
    ty = np.asarray(ty, np.int64)
    out = []
    for x, y in zip(tx, ty):
        out.append(
            "".join(
                "0123"[
                    ((int(y) >> (zoom - 1 - k)) & 1) * 2
                    + ((int(x) >> (zoom - 1 - k)) & 1)
                ]
                for k in range(zoom)
            )
        )
    return np.array(out)


def quadkey_sql(tx_expr: str, ty_expr: str, zoom: int) -> str:
    """DuckDB SQL twin of ``quadkey_col``."""
    digits = " || ".join(
        f"substring('0123', CAST(((({ty_expr}) >> {zoom - 1 - k}) & 1) * 2 "
        f"+ ((({tx_expr}) >> {zoom - 1 - k}) & 1) AS INTEGER) + 1, 1)"
        for k in range(zoom)
    )
    return digits
