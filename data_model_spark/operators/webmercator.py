"""Web-Mercator (EPSG:3857) slippy-map tiling: XYZ covers + quadkeys.

The tile-server addressing standard: z/x/y tile indices under the
spherical-Mercator projection (OSM, XYZ, TMS) and their Bing-style
quadkey strings (one base-4 digit per zoom level; prefix = ancestor
tile — the same containment-partition property as geohash).  The
engine's native grid is the reference's GeoZarr chunk grid; published
catalogs additionally key by slippy tile, so this is the interop
surface for serving.

Two operators:

* ``slippy_cover_fp`` — the covering XYZ tile RANGE of every scene
  footprint at a fixed zoom.  The Mercator y needs ``ln``/``tan``, so
  the kernel is vectorized NumPy inside one zero-shuffle
  ``mapInPandas`` (identical libm on executors and the driver-side
  replay — the ``spherical_area``/``solar`` fidelity argument), with
  footprint corners from the anchor grid and inverse TM.

* ``quadkey_encode`` — slippy (x, y, z) -> quadkey string as PURE JVM
  column arithmetic (bit interleave + substring, the ``geohash``
  pattern) with a GENERATIVE DuckDB SQL oracle over the identical
  integer expression; exercised on the deterministic congruential
  point scatter quantized to z=12 tiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import crs
from ..sources import images as img_src
from .registry import register

N_SCENES = 500
ZOOM = 12


def lonlat_to_slippy(lon: np.ndarray, lat: np.ndarray, z: int):
    """(x, y) slippy tile indices — the OSM formula, float64 NumPy."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    n = float(1 << z)
    x = np.floor((lon + 180.0) / 360.0 * n)
    phi = np.radians(lat)
    y = np.floor((1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi)) / np.pi) / 2.0 * n)
    lim = (1 << z) - 1
    return (
        np.clip(x, 0, lim).astype(np.int64),
        np.clip(y, 0, lim).astype(np.int64),
    )


def footprint_slippy_range(idx: np.ndarray, w: np.ndarray, h: np.ndarray, z: int):
    """(x0, x1, y0, y1) covering tile ranges of the scene footprints.

    Corners via the anchor grid + inverse TM (the ``spherical``
    derivation); the cover is the bounding range of the 4 corner tiles
    (footprints are small and TM is monotone over them, so corner
    bounds cover the edges).
    """
    idx = np.asarray(idx, np.int64)
    ax = img_src.ANCHOR_X0 + (idx % img_src.GRID_COLS) * img_src.GRID_STEP_M
    ay = img_src.ANCHOR_Y0 + (idx // img_src.GRID_COLS) * img_src.GRID_STEP_M
    wm = np.asarray(w, np.int64).astype(np.float64) * img_src.PIXEL_SIZE_M
    hm = np.asarray(h, np.int64).astype(np.float64) * img_src.PIXEL_SIZE_M
    zero = np.zeros_like(wm)
    cx = ax[:, None] + np.stack([zero, wm, wm, zero], axis=1)
    cy = ay[:, None] + np.stack([zero, zero, hm, hm], axis=1)
    zone, north = crs.epsg_to_utm_zone(img_src.SCENE_EPSG)
    lon, lat = crs.utm_to_lonlat(cx.ravel(), cy.ravel(), zone, north)
    tx, ty = lonlat_to_slippy(lon, lat, z)
    tx, ty = tx.reshape(-1, 4), ty.reshape(-1, 4)
    return tx.min(axis=1), tx.max(axis=1), ty.min(axis=1), ty.max(axis=1)


def slippy_scene_covers(spark: SparkSession, n: int = N_SCENES, z: int = ZOOM) -> DataFrame:
    """(image_id, z, x0, x1, y0, y1, n_tiles) — zero-shuffle metadata pass."""
    meta = img_src.generate_images_meta_df(spark, n).select("image_id", "w", "h")

    def kern(batches):
        for pdf in batches:
            idx = pdf["image_id"].str.slice(4).astype(np.int64).to_numpy()
            x0, x1, y0, y1 = footprint_slippy_range(
                idx, pdf["w"].to_numpy(), pdf["h"].to_numpy(), z
            )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "z": np.full(idx.size, z, np.int64),
                    "x0": x0,
                    "x1": x1,
                    "y0": y0,
                    "y1": y1,
                    "n_tiles": (x1 - x0 + 1) * (y1 - y0 + 1),
                }
            )

    return meta.mapInPandas(
        kern,
        "image_id string, z long, x0 long, x1 long, y0 long, y1 long, n_tiles long",
    )


def _slippy_oracle() -> str:
    from .mosaic_fp import _values_sql

    idx = np.arange(N_SCENES, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    x0, x1, y0, y1 = footprint_slippy_range(idx, dims[:, 0], dims[:, 1], ZOOM)
    rows = [
        (
            f"img_{int(i):012d}",
            ZOOM,
            int(a),
            int(b),
            int(c),
            int(d),
            int((b - a + 1) * (d - c + 1)),
        )
        for i, a, b, c, d in zip(idx, x0, x1, y0, y1)
    ]
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("z", "BIGINT"),
            ("x0", "BIGINT"),
            ("x1", "BIGINT"),
            ("y0", "BIGINT"),
            ("y1", "BIGINT"),
            ("n_tiles", "BIGINT"),
        ],
        rows,
    )


@register("slippy_cover_fp", _slippy_oracle)
def slippy_cover_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """z=12 slippy-tile cover ranges of the first 500 scene footprints —
    hash-checked against the bit-identical driver replay."""
    return slippy_scene_covers(spark)


def quadkey_col(x: Column, y: Column, z: int) -> Column:
    """Bing quadkey of slippy (x, y) at zoom z — pure JVM bit ops."""
    digits = [
        F.substring(
            F.lit("0123"),
            (
                F.shiftleft(
                    F.shiftright(y, z - 1 - i).bitwiseAND(F.lit(1)), 1
                )
                + F.shiftright(x, z - 1 - i).bitwiseAND(F.lit(1))
                + 1
            ).cast("int"),
            1,
        )
        for i in range(z)
    ]
    return F.concat(*digits)


def _quadkey_sql(xe: str, ye: str, z: int) -> str:
    digits = [
        f"substr('0123', CAST(((({ye} >> {z - 1 - i}) & 1) * 2"
        f" + (({xe} >> {z - 1 - i}) & 1)) + 1 AS INTEGER), 1)"
        for i in range(z)
    ]
    return " || ".join(digits)


_QK_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
t AS (
  SELECT point_id,
         CAST(floor((lon + 180.0) / 360.0 * {1 << ZOOM}) AS BIGINT) AS x,
         CAST(floor((lat + 90.0) / 180.0 * {1 << ZOOM}) AS BIGINT) AS y
  FROM pts)
SELECT point_id, x, y, {_quadkey_sql('x', 'y', ZOOM)} AS qk
FROM t
"""


@register("quadkey_encode", _QK_ORACLE)
def quadkey_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bing quadkeys of the customer points' equirectangular z=12 cells
    (pure-JVM bit interleave; exact-integer generative SQL oracle).

    NOTE: x/y here are the engine's equirectangular grid indices (the
    deterministic quantization both engines share) — the quadkey math
    itself is projection-agnostic over any (x, y, z)."""
    from .spatial_queries import _points

    pts = _points(spark, sf_dir)
    x = F.floor((F.col("lon") + 180.0) / 360.0 * (1 << ZOOM)).cast("long")
    y = F.floor((F.col("lat") + 90.0) / 180.0 * (1 << ZOOM)).cast("long")
    t = pts.select("point_id", x.alias("x"), y.alias("y"))
    return t.select(
        "point_id", "x", "y", quadkey_col(F.col("x"), F.col("y"), ZOOM).alias("qk")
    )
