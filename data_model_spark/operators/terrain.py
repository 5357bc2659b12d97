"""Terrain derivatives over the tiled raster: slope, aspect, hillshade.

Treats the uint16 tile mosaic as an elevation surface and computes the
classic raster derivatives (Horn 1981, the method every public GIS
documents): per-pixel 3x3 finite differences

    gx = ((c + 2f + i) - (a + 2d + g)) / (8 * cellsize)
    gy = ((g + 2h + i) - (a + 2b + c)) / (8 * cellsize)
    slope  = atan(z_factor * sqrt(gx^2 + gy^2))
    aspect = atan2(gy, -gx)
    shade  = 255 * max(0, cos(zenith) cos(slope)
                          + sin(zenith) sin(slope) cos(azimuth - aspect))

Built on ``focal.halo_exchange`` — the gradients at a tile's border rows
need the neighbor tiles' edge pixels, which is exactly the 1-pixel halo
the exchange ships (one shuffle, edge strips only).  Zero padding outside
the stored mosaic, so a tile at the mosaic edge equals the NumPy
zero-padded global-mosaic computation tile-for-tile
(``tests/test_terrain.py``).

Reference parity: the reference computes no terrain products (its
kernels are downsampling reductions, ``conversion/geozarr.py``); this is
the standard consumer-side derivative a raster engine serves next to
rendered tiles.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .focal import halo_exchange

_TERRAIN_FIELDS = [
    T.StructField("data", T.BinaryType(), False),  # uint8 hillshade canvas
    T.StructField("slope_mean_deg", T.DoubleType(), False),
    T.StructField("slope_max_deg", T.DoubleType(), False),
    T.StructField("shade_mean", T.DoubleType(), False),
]


def horn_terrain(
    P: np.ndarray,
    z_factor: float = 1.0,
    cellsize: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(slope_rad, hillshade_u8) for a 1-px-padded int canvas (NumPy)."""
    Z = P.astype(np.float64)
    a, b, c = Z[:-2, :-2], Z[:-2, 1:-1], Z[:-2, 2:]
    d, f = Z[1:-1, :-2], Z[1:-1, 2:]
    g, h, i = Z[2:, :-2], Z[2:, 1:-1], Z[2:, 2:]
    gx = ((c + 2 * f + i) - (a + 2 * d + g)) / (8.0 * cellsize)
    gy = ((g + 2 * h + i) - (a + 2 * b + c)) / (8.0 * cellsize)
    slope = np.arctan(z_factor * np.hypot(gx, gy))
    aspect = np.arctan2(gy, -gx)
    zen = math.radians(90.0 - altitude_deg)
    az = math.radians(360.0 - azimuth_deg + 90.0)
    shade = np.cos(zen) * np.cos(slope) + np.sin(zen) * np.sin(slope) * np.cos(
        az - aspect
    )
    shade_u8 = np.clip(np.rint(255.0 * np.maximum(shade, 0.0)), 0, 255).astype(
        np.uint8
    )
    return slope, shade_u8


def hillshade(
    tiles: DataFrame,
    z_factor: float = 1.0,
    cellsize: float = 1.0,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
) -> DataFrame:
    """Per-tile hillshade canvas + slope stats with true cross-tile halos."""

    def compute(P: np.ndarray, n_halo: int) -> dict:
        slope, shade = horn_terrain(
            P, z_factor, cellsize, azimuth_deg, altitude_deg
        )
        deg = np.degrees(slope)
        return {
            "data": shade.tobytes(),
            "slope_mean_deg": round(float(deg.mean()), 6),
            "slope_max_deg": round(float(deg.max()), 6),
            "shade_mean": round(float(shade.astype(np.float64).mean()), 6),
        }

    return halo_exchange(tiles, 1, compute, _TERRAIN_FIELDS)
