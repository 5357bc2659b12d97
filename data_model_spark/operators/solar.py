"""Per-scene solar geometry: zenith / azimuth via the NOAA equations.

Sun-angle metadata is a first-class EO column: hillshade/BRDF
normalization, terrain-correction, and cloud-shadow projection all key
off per-acquisition solar zenith and azimuth (the reference carries
acquisition metadata through STAC attributes,
``src/eopf_geozarr/conversion/geozarr.py``; the angles themselves it
assumes upstream).  This computes them from scene center + acquisition
time with the public NOAA General Solar Position Calculations
(fractional-year trig series for declination and the equation of time,
then the hour-angle spherical triangle).

Distributed design: pure metadata — scene centers derive from the
anchor grid without touching pixels, acquisition times are the
deterministic per-scene cycle, and the whole query is one vectorized
``mapInPandas`` pass (zero shuffle, embarrassingly parallel at 10^12
scenes).

Cross-engine exactness: every transcendental runs in NumPy on BOTH the
executors and the driver-side oracle replay (same libm build in the
same container), the ``spherical_area`` fidelity argument; angles are
quantized to integer micro-degrees HALF-UP inside the kernel so the
DuckDB VALUES transport is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions import crs
from ..sources import images as img_src
from .registry import register

N_SCENES = 500  # fixed fixture, sf-independent (metadata-only)


def scene_centers(idx: np.ndarray, w: np.ndarray, h: np.ndarray):
    """(lon, lat) of scene centers — anchor grid + half extent, inverse
    Transverse Mercator (the ``spherical`` footprint derivation)."""
    idx = np.asarray(idx, np.int64)
    ax = img_src.ANCHOR_X0 + (idx % img_src.GRID_COLS) * img_src.GRID_STEP_M
    ay = img_src.ANCHOR_Y0 + (idx // img_src.GRID_COLS) * img_src.GRID_STEP_M
    cx = ax + np.asarray(w, np.float64) * img_src.PIXEL_SIZE_M / 2.0
    cy = ay + np.asarray(h, np.float64) * img_src.PIXEL_SIZE_M / 2.0
    zone, north = crs.epsg_to_utm_zone(img_src.SCENE_EPSG)
    return crs.utm_to_lonlat(cx, cy, zone, north)


def acquisition_cycle(idx: np.ndarray):
    """(day_of_year, minute_of_day) — the deterministic per-scene
    acquisition schedule (UTC)."""
    idx = np.asarray(idx, np.int64)
    return 1 + (idx * 17) % 365, (idx * 131) % 1440


def solar_position(
    lon: np.ndarray, lat: np.ndarray, doy: np.ndarray, minute: np.ndarray
):
    """(zenith_deg, azimuth_deg) float64 — NOAA low-accuracy algorithm.

    ``minute`` is UTC minute-of-day; azimuth is clockwise from north.
    Fixed operation order, fully vectorized: the doubles are identical
    on engine and replay sides.
    """
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    hr = np.asarray(minute, np.float64) / 60.0
    g = 2.0 * np.pi / 365.0 * (np.asarray(doy, np.float64) - 1.0 + (hr - 12.0) / 24.0)
    eqtime = 229.18 * (
        0.000075
        + 0.001868 * np.cos(g)
        - 0.032077 * np.sin(g)
        - 0.014615 * np.cos(2.0 * g)
        - 0.040849 * np.sin(2.0 * g)
    )
    decl = (
        0.006918
        - 0.399912 * np.cos(g)
        + 0.070257 * np.sin(g)
        - 0.006758 * np.cos(2.0 * g)
        + 0.000907 * np.sin(2.0 * g)
        - 0.002697 * np.cos(3.0 * g)
        + 0.00148 * np.sin(3.0 * g)
    )
    tst = np.asarray(minute, np.float64) + eqtime + 4.0 * lon
    ha = np.radians(tst / 4.0 - 180.0)
    phi = np.radians(lat)
    cos_zen = np.sin(phi) * np.sin(decl) + np.cos(phi) * np.cos(decl) * np.cos(ha)
    zen = np.degrees(np.arccos(np.clip(cos_zen, -1.0, 1.0)))
    az = np.degrees(
        np.arctan2(
            np.sin(ha), np.cos(ha) * np.sin(phi) - np.tan(decl) * np.cos(phi)
        )
    )
    az = np.mod(az + 180.0, 360.0)
    return zen, az


def _udeg(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5).astype(np.int64)


def solar_scene_angles(spark: SparkSession, n: int = N_SCENES) -> DataFrame:
    """(image_id, doy, minute, zen_udeg, az_udeg) — one metadata-only
    mapInPandas pass, no shuffle."""
    meta = img_src.generate_images_meta_df(spark, n).select("image_id", "w", "h")

    def kern(batches):
        for pdf in batches:
            idx = pdf["image_id"].str.slice(4).astype(np.int64).to_numpy()
            lon, lat = scene_centers(idx, pdf["w"].to_numpy(), pdf["h"].to_numpy())
            doy, minute = acquisition_cycle(idx)
            zen, az = solar_position(lon, lat, doy, minute)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "doy": doy,
                    "minute": minute,
                    "zen_udeg": _udeg(zen),
                    "az_udeg": _udeg(az),
                }
            )

    return meta.mapInPandas(
        kern, "image_id string, doy long, minute long, zen_udeg long, az_udeg long"
    )


def _solar_oracle() -> str:
    from .mosaic_fp import _values_sql

    idx = np.arange(N_SCENES, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    lon, lat = scene_centers(idx, dims[:, 0], dims[:, 1])
    doy, minute = acquisition_cycle(idx)
    zen, az = solar_position(lon, lat, doy, minute)
    zq, aq = _udeg(zen), _udeg(az)
    rows = [
        (f"img_{int(i):012d}", int(d), int(m), int(z), int(a))
        for i, d, m, z, a in zip(idx, doy, minute, zq, aq)
    ]
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("doy", "BIGINT"),
            ("minute", "BIGINT"),
            ("zen_udeg", "BIGINT"),
            ("az_udeg", "BIGINT"),
        ],
        rows,
    )


@register("solar_angles", _solar_oracle)
def solar_angles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOAA solar zenith/azimuth (integer micro-degrees) for the first
    500 scenes at their deterministic acquisition instants — zero-shuffle
    metadata pass; the oracle replays the identical vectorized kernel."""
    return solar_scene_angles(spark)
