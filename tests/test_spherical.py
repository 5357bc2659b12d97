"""Spherical footprint area: kernel sanity + distributed == replay."""

import numpy as np

from data_model_spark.operators.spherical import (
    R_SPHERE,
    footprint_areas,
    sphere_mm2,
    spherical_scene_areas,
)
from data_model_spark.sources import images as img_src


def test_sphere_close_to_planar_small_footprints():
    """UTM zone 32 mid-latitude: spherical vs planar within ~1.5% (grid
    scale factor + ellipsoid-vs-sphere), never equal."""
    idx = np.arange(0, 300, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    planar, sphere = footprint_areas(idx, dims[:, 0], dims[:, 1])
    ratio = sphere / planar
    assert np.all(ratio > 0.985) and np.all(ratio < 1.015)
    assert np.all(sphere > 0)


def test_area_scales_with_pixels():
    idx = np.zeros(2, dtype=np.int64)
    _, s = footprint_areas(idx, np.array([64, 128]), np.array([64, 128]))
    assert 3.9 < s[1] / s[0] < 4.1


def test_whole_sphere_sanity():
    """The formula's normalization: a tiny square's steradian content
    implied by area/R^2 matches the planar solid-angle estimate."""
    idx = np.array([0], dtype=np.int64)
    planar, sphere = footprint_areas(idx, np.array([64]), np.array([64]))
    omega = sphere[0] / (R_SPHERE * R_SPHERE)
    assert abs(omega * R_SPHERE * R_SPHERE / planar[0] - 1) < 0.02


def test_distributed_matches_driver_replay(spark):
    n = 120
    got = {
        r.image_id: (int(r.planar_m2), int(r.sphere_mm2))
        for r in spherical_scene_areas(spark, n).collect()
    }
    idx = np.arange(n, dtype=np.int64)
    dims = np.array([img_src.image_dims(int(i)) for i in idx], dtype=np.int64)
    planar, sphere = footprint_areas(idx, dims[:, 0], dims[:, 1])
    mm2 = sphere_mm2(sphere)
    assert len(got) == n
    for i in range(n):
        iid = f"img_{i:012d}"
        assert got[iid][0] == int(planar[i])
        # exact: identical kernel doubles, quantized in-kernel both sides
        assert got[iid][1] == int(mm2[i])
