"""Slippy tiles + quadkeys: published-value goldens + replay parity."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from data_model_spark.operators.webmercator import (
    N_SCENES,
    ZOOM,
    footprint_slippy_range,
    lonlat_to_slippy,
    quadkey_col,
    slippy_cover_fp,
)


def test_known_slippy_values():
    # (lat 51.51, lon -0.13) at z=17 -> (65488, 43583): pinned against an
    # INDEPENDENT derivation through EPSG:3857 meters
    # (x_m = R*lon_rad, y_m = R*ln(tan(pi/4 + phi/2)), tile = floor over
    # the 2*pi*R world extent), which agrees exactly
    x, y = lonlat_to_slippy(np.array([-0.13]), np.array([51.51]), 17)
    assert (x[0], y[0]) == (65488, 43583)
    R, z = 6378137.0, 17
    xm = np.radians(-0.13) * R
    ym = R * np.log(np.tan(np.pi / 4 + np.radians(51.51) / 2))
    world = 2 * np.pi * R
    assert int(np.floor((xm + world / 2) / world * (1 << z))) == 65488
    assert int(np.floor((world / 2 - ym) / world * (1 << z))) == 43583
    # equator/greenwich at z=1 -> tile (1, 1) (SE quadrant starts there)
    x, y = lonlat_to_slippy(np.array([0.0]), np.array([0.0]), 1)
    assert (x[0], y[0]) == (1, 1)
    # z=0: everything is tile (0, 0)
    x, y = lonlat_to_slippy(np.array([120.0]), np.array([-45.0]), 0)
    assert (x[0], y[0]) == (0, 0)


def test_quadkey_known_values(spark):
    # bing docs example: tile (3, 5) at level 3 -> quadkey "213"
    df = spark.createDataFrame(pd.DataFrame({"x": [3], "y": [5]}))
    got = df.select(
        quadkey_col(F.col("x"), F.col("y"), 3).alias("qk")
    ).collect()[0].qk
    assert got == "213"


def test_quadkey_prefix_is_parent(spark):
    # the z-1 quadkey of the parent tile is the child's prefix
    df = spark.createDataFrame(pd.DataFrame({"x": [1234], "y": [2857]}))
    qk = df.select(quadkey_col(F.col("x"), F.col("y"), 12).alias("a")).collect()[0].a
    parent = spark.createDataFrame(pd.DataFrame({"x": [617], "y": [1428]}))
    pqk = parent.select(
        quadkey_col(F.col("x"), F.col("y"), 11).alias("a")
    ).collect()[0].a
    assert qk[:11] == pqk


def test_cover_contains_center_scene():
    from data_model_spark.sources import images as img_src

    idx = np.arange(N_SCENES, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    x0, x1, y0, y1 = footprint_slippy_range(idx, dims[:, 0], dims[:, 1], ZOOM)
    assert (x0 <= x1).all() and (y0 <= y1).all()
    # footprints are km-scale: covers stay small at z=12
    assert ((x1 - x0 + 1) * (y1 - y0 + 1)).max() <= 9


def test_engine_matches_replay(spark):
    from data_model_spark.sources import images as img_src

    got = {
        r.image_id: (r.z, r.x0, r.x1, r.y0, r.y1, r.n_tiles)
        for r in slippy_cover_fp(spark, "").collect()
    }
    idx = np.arange(N_SCENES, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    x0, x1, y0, y1 = footprint_slippy_range(idx, dims[:, 0], dims[:, 1], ZOOM)
    for i in idx:
        key = f"img_{int(i):012d}"
        nt = int((x1[i] - x0[i] + 1) * (y1[i] - y0[i] + 1))
        assert got[key] == (ZOOM, x0[i], x1[i], y0[i], y1[i], nt)
