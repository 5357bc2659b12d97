"""Spherical scene-footprint area (Chamberlain–Duquette polygon area).

Planar shoelace area is wrong on the globe: a catalog that reports
coverage in km^2, bills by acquired area, or weights scenes for sampling
must integrate on the sphere, and the error of the planar UTM number
grows with latitude and footprint size (UTM grid scale alone is
0.9996..1.0004 across a zone).  This operator computes the spherical
polygon area of every scene footprint with the Chamberlain & Duquette
(2007) line-integral formula — the same closed form turf.js and PostGIS
``ST_Area(geography)`` (sphere mode) use:

    area = |sum_i (lam_{i+1} - lam_i) * (2 + sin(phi_i) + sin(phi_{i+1}))|
           * R^2 / 2

Distributed design: pure metadata — the footprint ring is derived from
(scene anchor, w, h) without touching pixel bytes, the whole query is
one ``mapInPandas`` over the scan (no shuffle, no decode), and the
kernel is a fully vectorized NumPy batch (corner grids -> inverse
Transverse-Mercator via ``crs.utm_to_lonlat`` -> fixed-order edge sum),
so at 10^12 rows it is an embarrassingly parallel single pass.

Cross-engine exactness: the oracle replays the IDENTICAL batch kernel
driver-side over the same deterministic dim/anchor cycles — the
``mosaic_fp`` fidelity argument (same dtype, same operation order =>
IEEE-identical doubles, verified bit-exact engine-vs-driver in tests).
The registered query emits the area as integer mm^2 (HALF_UP at the
double, quantized INSIDE both kernels) because DOUBLE values cannot be
transported exactly through a DuckDB oracle: DuckDB parses double
literals 1 ULP off shortest-roundtrip ``repr``.  Quantizing the same
bit-identical double on both sides makes the integers equal with zero
flake risk.

Reference context: footprint/bbox handling mirrors the reference's STAC
proj metadata (``src/eopf_geozarr/conversion/geozarr.py`` bbox path);
the reference computes no areas — this extends the catalog surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions import crs
from ..sources import images as img_src
from .registry import register

R_SPHERE = 6371008.7714  # IUGG mean Earth radius R1 (public constant)
N_SCENES = 500  # fixed fixture, sf-independent (metadata-only)


def footprint_areas(idx: np.ndarray, w: np.ndarray, h: np.ndarray):
    """(planar_m2 int64, sphere_m2 float64) for scene indices ``idx``.

    Vectorized over the batch: (n, 4) corner grids in scene UTM ->
    inverse TM to lon/lat -> Chamberlain–Duquette edge sum in a fixed
    order (axis-1 reduction), so the doubles are plan-independent.
    """
    idx = np.asarray(idx, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    h = np.asarray(h, dtype=np.int64)
    ax = img_src.ANCHOR_X0 + (idx % img_src.GRID_COLS) * img_src.GRID_STEP_M
    ay = img_src.ANCHOR_Y0 + (idx // img_src.GRID_COLS) * img_src.GRID_STEP_M
    wm = w.astype(np.float64) * img_src.PIXEL_SIZE_M
    hm = h.astype(np.float64) * img_src.PIXEL_SIZE_M
    # counter-clockwise ring, closing edge handled by np.roll
    cx = ax[:, None] + np.stack([np.zeros_like(wm), wm, wm, np.zeros_like(wm)], axis=1)
    cy = ay[:, None] + np.stack([np.zeros_like(hm), np.zeros_like(hm), hm, hm], axis=1)
    zone, north = crs.epsg_to_utm_zone(img_src.SCENE_EPSG)
    lon, lat = crs.utm_to_lonlat(cx.ravel(), cy.ravel(), zone, north)
    lam = np.radians(lon).reshape(-1, 4)
    phi = np.radians(lat).reshape(-1, 4)
    lam2, phi2 = np.roll(lam, -1, axis=1), np.roll(phi, -1, axis=1)
    total = np.sum((lam2 - lam) * (2.0 + np.sin(phi) + np.sin(phi2)), axis=1)
    sphere = np.abs(total) * (R_SPHERE * R_SPHERE) / 2.0
    planar = w * h * int(img_src.PIXEL_SIZE_M) ** 2
    return planar, sphere


def sphere_mm2(sphere: np.ndarray) -> np.ndarray:
    """HALF_UP integer-mm^2 quantization of the exact double areas —
    applied to the identical double on both engine and oracle sides."""
    return np.floor(sphere * 1000.0 + 0.5).astype(np.int64)


def spherical_scene_areas(spark: SparkSession, n: int = N_SCENES) -> DataFrame:
    """(image_id, planar_m2, sphere_mm2) for the first ``n`` scenes —
    one metadata-only mapInPandas pass, no shuffle."""
    meta = img_src.generate_images_meta_df(spark, n).select("image_id", "w", "h")

    def kern(batches):
        for pdf in batches:
            idx = pdf["image_id"].str.slice(4).astype(np.int64).to_numpy()
            planar, sphere = footprint_areas(
                idx, pdf["w"].to_numpy(), pdf["h"].to_numpy()
            )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "planar_m2": planar,
                    "sphere_mm2": sphere_mm2(sphere),
                }
            )

    return meta.mapInPandas(
        kern, "image_id string, planar_m2 long, sphere_mm2 long"
    )


def _spherical_oracle() -> str:
    from .mosaic_fp import _values_sql

    idx = np.arange(N_SCENES, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    planar, sphere = footprint_areas(idx, dims[:, 0], dims[:, 1])
    mm2 = sphere_mm2(sphere)
    rows = [
        (f"img_{int(i):012d}", int(p), int(s))
        for i, p, s in zip(idx, planar, mm2)
    ]
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("planar_m2", "BIGINT"),
            ("sphere_mm2", "BIGINT"),
        ],
        rows,
    )


@register("spherical_area", _spherical_oracle)
def spherical_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical footprint area (integer mm^2) of the first 500 scenes
    next to the exact planar UTM area — zero-shuffle metadata pass; the
    oracle replays the identical vectorized kernel driver-side and
    quantizes the same bit-identical double."""
    return spherical_scene_areas(spark)
