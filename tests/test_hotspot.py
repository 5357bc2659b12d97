"""LISA pair: Gi*/Moran properties + NumPy replay + partition invariance."""

import numpy as np
import pandas as pd

from data_model_spark.operators.hotspot import RES, cell_counts, local_stats
from data_model_spark.operators.surfaces import grid_window

N = 1 << RES


def _window_df(spark, tx0, tx1, ty0, ty1):
    lon0 = tx0 / N * 360.0 - 180.0 + 1e-9
    lon1 = (tx1 + 0.5) / N * 360.0 - 180.0
    lat0 = ty0 / N * 180.0 - 90.0 + 1e-9
    lat1 = (ty1 + 0.5) / N * 180.0 - 90.0
    return grid_window(spark, RES, lon0, lat0, lon1, lat1)


def _pts_at_cells(spark, cells_with_counts):
    rows = []
    k = 0
    for (tx, ty), c in cells_with_counts.items():
        clon = (tx + 0.5) / N * 360.0 - 180.0
        clat = (ty + 0.5) / N * 180.0 - 90.0
        for _ in range(c):
            rows.append((k, clon, clat))
            k += 1
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["point_id", "lon", "lat"])
    )


def _ref_stats(counts, ring_of):
    xs = np.array(list(counts.values()), np.float64)
    n, xbar = len(xs), xs.mean()
    s2 = (xs * xs).mean() - xbar * xbar
    out = {}
    for key in counts:
        ring = ring_of(key)
        m = len(ring)
        sj = sum(counts[r] for r in ring)
        gi = (sj - xbar * m) / (
            np.sqrt(s2) * np.sqrt((n * m - m * m) / (n - 1.0))
        )
        moran = (counts[key] - xbar) / s2 * (sj - counts[key] - xbar * (m - 1.0))
        out[key] = (gi, moran)
    return out


def test_hot_center_cold_corner(spark):
    # 5x5 window: a big spike in the middle, zeros elsewhere
    tx0, ty0 = 4329, 3098
    counts = {
        (tx0 + dx, ty0 + dy): 0 for dx in range(5) for dy in range(5)
    }
    counts[(tx0 + 2, ty0 + 2)] = 50
    window = _window_df(spark, tx0, tx0 + 4, ty0, ty0 + 4)
    cells = cell_counts(_pts_at_cells(spark, counts), window)
    got = {(r.tx, r.ty): (r.x, r.m, r.sj, r.gi_q, r.moran_q)
           for r in local_stats(cells).collect()}
    assert len(got) == 25
    center = got[(tx0 + 2, ty0 + 2)]
    corner = got[(tx0, ty0)]
    assert center[0] == 50 and center[2] == 50  # own count, ring sum
    assert center[3] > 0 > corner[3]  # hot center, cold corner

    def ring_of(key):
        tx, ty = key
        return [
            (tx + dx, ty + dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (tx + dx, ty + dy) in counts
        ]

    ref = _ref_stats(counts, ring_of)
    for key, (x, m, sj, gi_q, moran_q) in got.items():
        rg, rm = ref[key]
        assert gi_q == int(np.floor(rg * 1e6 + 0.5)), key
        assert moran_q == int(np.floor(rm * 1e6 + 0.5)), key


def test_partition_invariance(spark):
    tx0, ty0 = 4330, 3100
    rng = np.random.default_rng(8)
    counts = {
        (tx0 + dx, ty0 + dy): int(rng.integers(0, 20))
        for dx in range(6)
        for dy in range(4)
    }
    window = _window_df(spark, tx0, tx0 + 5, ty0, ty0 + 3)
    pts = _pts_at_cells(spark, counts)
    a = local_stats(cell_counts(pts, window))
    b = local_stats(cell_counts(pts.repartition(11), window.repartition(3)))
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 24
