"""DBSCAN + radius self-join exactness tests.

The radius join's completeness claim (3x3 cell ring finds every pair
within eps when cells are >= eps wide) is checked against an all-pairs
NumPy haversine oracle; DBSCAN roles/labels are checked against a
reference NumPy implementation of Ester et al. KDD'96 with the same
min-label determinization.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators.dbscan import _blob_points, dbscan
from data_model_spark.operators.spatial import radius_join

SF = "/root/testdata/sf0.001"
EPS, MIN_PTS, RES, LAT_MAX = 600.0, 4, 14, 47.9

R_EARTH = 6371008.8


def _haversine(lon_a, lat_a, lon_b, lat_b):
    la, lb = np.radians(lat_a), np.radians(lat_b)
    dlat = lb - la
    dlon = np.radians(lon_b) - np.radians(lon_a)
    h = np.sin(dlat / 2) ** 2 + np.cos(la) * np.cos(lb) * np.sin(dlon / 2) ** 2
    return 2 * R_EARTH * np.arcsin(np.sqrt(np.minimum(1.0, h)))


@pytest.fixture(scope="module")
def pts_pdf(spark):
    return _blob_points(spark, SF).toPandas().sort_values("point_id")


def _brute_pairs(pdf, eps):
    ids = pdf["point_id"].to_numpy()
    lon = pdf["lon"].to_numpy()
    lat = pdf["lat"].to_numpy()
    d = _haversine(lon[:, None], lat[:, None], lon[None, :], lat[None, :])
    d = np.round(d, 3)
    ia, ib = np.where((d <= eps) & (ids[:, None] < ids[None, :]))
    return {(int(ids[a]), int(ids[b])) for a, b in zip(ia, ib)}


def test_radius_join_matches_bruteforce(spark, pts_pdf):
    pts = _blob_points(spark, SF)
    got = {(r.id_a, r.id_b) for r in radius_join(pts, EPS, RES, LAT_MAX).collect()}
    want = _brute_pairs(pts_pdf, EPS)
    assert got == want
    assert len(got) >= 5  # non-vacuous even at sf0.001 (150 customers)


def test_radius_join_refuses_too_fine_grid(spark):
    pts = _blob_points(spark, SF)
    with pytest.raises(ValueError, match="coarser res"):
        radius_join(pts, 600.0, res=18, lat_max=47.9)


def _numpy_dbscan(pdf, eps, min_pts):
    pairs = _brute_pairs(pdf, eps)
    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    core = {n for n, s in nbrs.items() if len(s) + 1 >= min_pts}
    # min-label closure over the core-core graph
    lbl = {c: c for c in core}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            if a in core and b in core:
                m = min(lbl[a], lbl[b])
                if lbl[a] != m or lbl[b] != m:
                    lbl[a] = lbl[b] = m
                    changed = True
    out = {}
    for pid in pdf["point_id"]:
        pid = int(pid)
        if pid in core:
            out[pid] = (lbl[pid], "core")
        else:
            core_nb = [lbl[n] for n in nbrs.get(pid, ()) if n in core]
            out[pid] = (min(core_nb), "border") if core_nb else (-1, "noise")
    return out


def test_dbscan_matches_numpy(spark, pts_pdf):
    pts = _blob_points(spark, SF)
    got = {
        int(r.point_id): (int(r.cluster), r.role)
        for r in dbscan(pts, EPS, MIN_PTS, res=RES, lat_max=LAT_MAX).collect()
    }
    want = _numpy_dbscan(pts_pdf, EPS, MIN_PTS)
    assert got == want
    # at sf0.01+ the planted blobs yield all three roles; sf0.001's 150
    # points are sparse enough that exactness (above) is the whole check


def test_dbscan_roles_handbuilt(spark):
    # 5-point clique (cores), one point within eps of exactly one core
    # (border), one far point (noise).  At lat 46, 600 m ~ 0.00776 deg lon.
    lons = [10.000, 10.001, 10.002, 10.003, 10.004, 10.0115, 10.5]
    rows = [(i, lo, 46.0) for i, lo in enumerate(lons)]
    pts = spark.createDataFrame(rows, "point_id long, lon double, lat double")
    got = {
        int(r.point_id): (int(r.cluster), r.role)
        for r in dbscan(pts, EPS, MIN_PTS, res=RES, lat_max=46.1).collect()
    }
    assert got == {
        0: (0, "core"),
        1: (0, "core"),
        2: (0, "core"),
        3: (0, "core"),
        4: (0, "core"),
        5: (0, "border"),
        6: (-1, "noise"),
    }


def test_fast_path_matches_distributed(spark, sf_dir, monkeypatch):
    from data_model_spark.operators import dbscan as dmod

    pts = dmod._blob_points(spark, sf_dir)
    fast = {
        int(r.point_id): (int(r.cluster), r.role)
        for r in dbscan(pts, EPS, MIN_PTS, res=RES, lat_max=48.0).collect()
    }
    monkeypatch.setattr(dmod, "DBSCAN_SMALL_EDGES", 0)  # force distributed
    slow = {
        int(r.point_id): (int(r.cluster), r.role)
        for r in dbscan(pts, EPS, MIN_PTS, res=RES, lat_max=48.0).collect()
    }
    assert fast == slow
