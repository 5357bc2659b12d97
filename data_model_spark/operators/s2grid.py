"""S2-style cube-face quadtree cell index: face/UV/ST -> (face, i, j).

Completes the H3/S2 pair of published planet-scale indexes (the hex
lattice is `hexgrid.py`): points map to one of 6 cube faces by their
dominant unit-vector component, gnomonically project to face (u, v) in
[-1, 1]^2, pass through S2's QUADRATIC area-equalizing ST transform
(``s = sqrt(1+3u)/2`` for u >= 0, mirrored below), and quantize to a
2^L x 2^L grid — the published s2geometry face/UV/ST pipeline
(S2Coords; the Hilbert position shuffle that s2geometry applies *after*
(face, i, j) is an invertible relabeling and is intentionally omitted:
(face, i, j) is already the partition/join key).  Quadratic ST keeps
max/min cell-area ratio ~2.1 vs ~5.2 for linear — the property that
makes S2 cells usable as balanced shuffle keys planet-wide.

Distributed design: both operators are zero-shuffle vectorized
``mapInPandas`` passes (trig/sqrt need libm, so the kernel is NumPy on
executors AND in the driver-side replay oracle — the ``solar``/
``slippy_cover_fp`` fidelity argument; fixtures are sf-independent so
the VALUES oracles transport exactly).  The footprint cover uses the
4-corner ij bounding rectangle, EXACT here because on a single face u
and v are each monotone in lon and in lat over the test box (for the
+z face: u = -cot(lat)·cos(lon), v = -cot(lat)·sin(lon); all four
partials keep a fixed sign over lon in (0°, 90°), lat > 45°), so edge
extremes are attained at corners — the argument is asserted by a
dense-sampling pytest, not assumed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import crs
from ..sources import images as img_src
from ..sources.tables import fixture_range
from .registry import register

LEVEL = 14  # 2^14 x 2^14 cells per face (~600 m at the equator)
N_PTS = 600  # fixed point fixture (sf-independent, like N_SCENES)
N_SCENES = 500


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """s2geometry's XYZtoFaceUV: dominant axis -> face 0..5, gnomonic (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(axis, [x, y, z])
    face = axis + np.where(major < 0.0, 3, 0)
    # non-selected branches may divide by zero; the selected branch always
    # divides by the dominant component (|major| >= 1/sqrt(3) > 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,
        )
    return face.astype(np.int64), u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic area-equalizing transform, [-1,1] -> [0,1]."""
    # both np.where arms evaluate; the untaken arm can sqrt a negative
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * u),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u),
        )


def st_to_ij(s: np.ndarray, level: int = LEVEL) -> np.ndarray:
    n = 1 << level
    return np.clip(np.floor(s * n), 0, n - 1).astype(np.int64)


def lonlat_to_cell(lon, lat, level: int = LEVEL):
    """(face, i, j) S2-style cell of each (lon, lat)."""
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    return face, st_to_ij(uv_to_st(u), level), st_to_ij(uv_to_st(v), level)


def scatter_lonlat(ids: np.ndarray):
    """The engine's congruential point scatter, computed in NumPy."""
    ids = np.asarray(ids, np.int64)
    return (
        10.0 + (ids * 37 % 2000) / 1000.0,
        46.0 + (ids * 91 % 2000) / 1000.0,
    )


def s2_point_cells(spark: SparkSession, n: int = N_PTS) -> DataFrame:
    """(point_id, face, i, j) for the fixed scatter — zero shuffle."""
    base = fixture_range(spark, n).select(F.col("id").alias("point_id"))

    def kern(batches):
        for pdf in batches:
            ids = pdf["point_id"].to_numpy()
            lon, lat = scatter_lonlat(ids)
            face, i, j = lonlat_to_cell(lon, lat)
            yield pd.DataFrame(
                {"point_id": ids, "face": face, "i": i, "j": j}
            )

    return base.mapInPandas(kern, "point_id long, face long, i long, j long")


def _cells_oracle() -> str:
    from .mosaic_fp import _values_sql

    ids = np.arange(N_PTS, dtype=np.int64)
    lon, lat = scatter_lonlat(ids)
    face, i, j = lonlat_to_cell(lon, lat)
    rows = [
        (int(p), int(f), int(a), int(b))
        for p, f, a, b in zip(ids, face, i, j)
    ]
    return _values_sql(
        [
            ("point_id", "BIGINT"),
            ("face", "BIGINT"),
            ("i", "BIGINT"),
            ("j", "BIGINT"),
        ],
        rows,
    )


@register("s2_cells_fp", _cells_oracle)
def s2_cells_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-14 cube-face cells of the fixed 600-point scatter —
    hash-checked against the bit-identical driver NumPy replay."""
    return s2_point_cells(spark)


def footprint_cell_range(idx: np.ndarray, w: np.ndarray, h: np.ndarray,
                         level: int = LEVEL):
    """(face, i0, i1, j0, j1) exact cover ranges of scene footprints.

    Corners via the anchor grid + inverse TM (`webmercator` derivation);
    the 4-corner ij rectangle is the exact cover because u and v are
    monotone in lon/lat on a single face over the scene box (module
    docstring; asserted by the dense-sampling pytest).
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
    face, i, j = lonlat_to_cell(lon, lat, level)
    face, i, j = face.reshape(-1, 4), i.reshape(-1, 4), j.reshape(-1, 4)
    if not (face == face[:, :1]).all():
        raise ValueError("footprint spans a cube-face boundary")
    return (
        face[:, 0],
        i.min(axis=1), i.max(axis=1),
        j.min(axis=1), j.max(axis=1),
    )


def s2_scene_covers(spark: SparkSession, n: int = N_SCENES) -> DataFrame:
    """(image_id, face, i0, i1, j0, j1, n_cells) — zero-shuffle pass."""
    meta = img_src.generate_images_meta_df(spark, n).select("image_id", "w", "h")

    def kern(batches):
        for pdf in batches:
            idx = pdf["image_id"].str.slice(4).astype(np.int64).to_numpy()
            face, i0, i1, j0, j1 = footprint_cell_range(
                idx, pdf["w"].to_numpy(), pdf["h"].to_numpy()
            )
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "face": face,
                    "i0": i0,
                    "i1": i1,
                    "j0": j0,
                    "j1": j1,
                    "n_cells": (i1 - i0 + 1) * (j1 - j0 + 1),
                }
            )

    return meta.mapInPandas(
        kern,
        "image_id string, face long, i0 long, i1 long, j0 long, j1 long,"
        " n_cells long",
    )


def _cover_oracle() -> str:
    from .mosaic_fp import _values_sql

    idx = np.arange(N_SCENES, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    face, i0, i1, j0, j1 = footprint_cell_range(idx, dims[:, 0], dims[:, 1])
    rows = [
        (
            f"img_{int(k):012d}",
            int(f),
            int(a),
            int(b),
            int(c),
            int(d),
            int((b - a + 1) * (d - c + 1)),
        )
        for k, f, a, b, c, d in zip(idx, face, i0, i1, j0, j1)
    ]
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("face", "BIGINT"),
            ("i0", "BIGINT"),
            ("i1", "BIGINT"),
            ("j0", "BIGINT"),
            ("j1", "BIGINT"),
            ("n_cells", "BIGINT"),
        ],
        rows,
    )


@register("s2_cover_fp", _cover_oracle)
def s2_cover_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-14 cube-face cell cover ranges of the first 500 scene
    footprints — hash-checked against the bit-identical driver replay."""
    return s2_scene_covers(spark)
