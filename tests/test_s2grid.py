"""S2-style cube-face index: goldens, invariants, cover exactness."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.s2grid import (
    LEVEL,
    footprint_cell_range,
    lonlat_to_cell,
    lonlat_to_xyz,
    s2_point_cells,
    scatter_lonlat,
    st_to_ij,
    uv_to_st,
    xyz_to_face_uv,
)

HALF = 1 << (LEVEL - 1)


def test_axis_goldens():
    # the six axis directions hit the six face centers (u = v = 0 ->
    # s = t = 0.5 -> the first cell past the face midline)
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    face, i, j = lonlat_to_cell(lon, lat)
    assert face.tolist() == [0, 1, 2, 3, 4, 5]
    # lon=180 evaluates sin(pi) ~ 1.2e-16, landing an ulp below the face
    # midline — either center-adjacent cell is the correct quantization
    assert np.isin(i, [HALF - 1, HALF]).all()
    assert np.isin(j, [HALF - 1, HALF]).all()


def test_quadratic_st_endpoints():
    u = np.array([-1.0, 0.0, 1.0])
    s = uv_to_st(u)
    assert np.allclose(s, [0.0, 0.5, 1.0])
    # odd symmetry about the center: st(u) + st(-u) == 1
    r = np.linspace(-1, 1, 101)
    assert np.allclose(uv_to_st(r) + uv_to_st(-r), 1.0)


def test_face_partition_covers_sphere():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    assert set(np.unique(face)) <= set(range(6))
    # gnomonic coords of the OWN face are always in [-1, 1]
    assert (np.abs(u) <= 1.0 + 1e-12).all()
    assert (np.abs(v) <= 1.0 + 1e-12).all()


def test_box_is_on_one_face_and_monotone():
    # the 2x2-deg test box (lat > 45) sits on the +z face, and i is
    # monotone in lon at fixed lat (the cover-exactness precondition)
    lats = np.full(50, 47.0)
    lons = np.linspace(10.0, 12.0, 50)
    face, i, j = lonlat_to_cell(lons, lats)
    assert (face == 2).all()
    assert (np.diff(i) >= 0).all()


def test_cover_exact_against_dense_sampling():
    # corner-rect cover == dense-interior-sampling cover for the first
    # 40 scenes: no sampled point escapes, and every extreme is attained
    from data_model_spark.sources import images as img_src

    idx = np.arange(40, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(k)) for k in idx], np.int64)
    face, i0, i1, j0, j1 = footprint_cell_range(idx, dims[:, 0], dims[:, 1])
    from data_model_spark.functions import crs

    zone, north = crs.epsg_to_utm_zone(img_src.SCENE_EPSG)
    for n, k in enumerate(idx):
        ax = img_src.ANCHOR_X0 + (int(k) % img_src.GRID_COLS) * img_src.GRID_STEP_M
        ay = img_src.ANCHOR_Y0 + (int(k) // img_src.GRID_COLS) * img_src.GRID_STEP_M
        wm, hm = dims[n, 0] * img_src.PIXEL_SIZE_M, dims[n, 1] * img_src.PIXEL_SIZE_M
        gx, gy = np.meshgrid(np.linspace(0, wm, 17), np.linspace(0, hm, 17))
        lon, lat = crs.utm_to_lonlat(ax + gx.ravel(), ay + gy.ravel(), zone, north)
        f, ii, jj = lonlat_to_cell(lon, lat)
        assert (f == face[n]).all()
        assert ii.min() >= i0[n] and ii.max() <= i1[n]
        assert jj.min() >= j0[n] and jj.max() <= j1[n]
        # extremes attained (cover is tight, not just a superset)
        assert ii.min() == i0[n] and ii.max() == i1[n]
        assert jj.min() == j0[n] and jj.max() == j1[n]


def test_spark_matches_replay(spark):
    got = {
        r.point_id: (r.face, r.i, r.j)
        for r in s2_point_cells(spark, n=200).collect()
    }
    ids = np.arange(200, dtype=np.int64)
    lon, lat = scatter_lonlat(ids)
    face, i, j = lonlat_to_cell(lon, lat)
    exp = {
        int(p): (int(f), int(a), int(b))
        for p, f, a, b in zip(ids, face, i, j)
    }
    assert got == exp
