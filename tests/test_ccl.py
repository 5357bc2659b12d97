"""Distributed CCL tests: region-size multiset equality with the
sequential global union-find (random mosaics, seam-crossing snakes),
4-connectivity semantics (diagonals split), local-pass unit checks, and
parallelism determinism."""

import numpy as np

from data_model_spark.operators.ccl import (
    label_tile,
    raster_region_stats,
    raster_regions,
    reference_region_stats,
    reference_regions,
)
from data_model_spark.operators.tiling import TILE_PX


def _tiles_df(spark, canvases):
    rows = [
        ("v", 0, tx, ty, Z.astype(">u2").tobytes())
        for (tx, ty), Z in canvases.items()
    ]
    return spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )


def _mosaic(canvases):
    txs = sorted({tx for tx, _ in canvases})
    tys = sorted({ty for _, ty in canvases}, reverse=True)  # ty+1 is north
    n = TILE_PX
    G = np.zeros((len(tys) * n, len(txs) * n), dtype=np.uint16)
    for (tx, ty), Z in canvases.items():
        G[tys.index(ty) * n : (tys.index(ty) + 1) * n,
          txs.index(tx) * n : (txs.index(tx) + 1) * n] = Z
    return G


def _sizes(spark, canvases, thr):
    return sorted(
        r.px for r in raster_regions(_tiles_df(spark, canvases), thr).collect()
    )


def test_label_tile_units():
    m = np.array(
        [[1, 1, 0, 1],
         [0, 1, 0, 1],
         [1, 0, 0, 1],
         [1, 1, 0, 0]], dtype=bool)
    labels, n = label_tile(m)
    assert n == 3
    cnt = sorted(np.bincount(labels.ravel())[1:].tolist())
    assert cnt == [3, 3, 3]
    # diagonal-only touch does NOT connect (4-connectivity)
    d = np.array([[1, 0], [0, 1]], dtype=bool)
    assert label_tile(d)[1] == 2


def test_u_snake_across_three_interfaces(spark):
    # a U spanning a 2x2 tile mosaic: down the west tiles, across the
    # south, up the east tiles -> ONE region stitched from 4+ fragments
    n = TILE_PX
    canv = {(tx, ty): np.zeros((n, n), np.uint16) for tx in (0, 1) for ty in (0, 1)}
    canv[(0, 1)][:, 10:20] = 7          # west arm, north tile
    canv[(0, 0)][:, 10:20] = 7          # west arm, south tile
    canv[(0, 0)][n - 20 : n - 10, :] = 7  # bottom bar west
    canv[(1, 0)][n - 20 : n - 10, :] = 7  # bottom bar east
    canv[(1, 0)][:, n - 20 : n - 10] = 7  # east arm, south tile
    canv[(1, 1)][:, n - 20 : n - 10] = 7  # east arm, north tile
    got = _sizes(spark, canv, 5)
    want = reference_regions(_mosaic(canv), 5)
    assert got == want
    assert len(got) == 1  # all one snake
    out = raster_regions(_tiles_df(spark, canv), 5).collect()
    # arm+bar merge inside each southern tile -> 4 per-tile fragments
    assert out[0].n_labels == 4


def test_random_2x2_mosaic(spark):
    n = TILE_PX
    rng = np.random.default_rng(21)
    canv = {
        (tx, ty): (rng.random((n, n)) < 0.4).astype(np.uint16) * 100
        for tx in (0, 1)
        for ty in (3, 4)
    }
    got = _sizes(spark, canv, 50)
    want = reference_regions(_mosaic(canv), 50)
    assert got == want
    assert len(got) > 100


def test_checker_seam_does_not_bridge(spark):
    # alternating columns at the seam: fragments touch the border but the
    # facing pixels are background -> no stitch
    n = TILE_PX
    Z0 = np.zeros((n, n), np.uint16)
    Z1 = np.zeros((n, n), np.uint16)
    Z0[0::2, n - 1] = 9   # east border, even rows
    Z1[1::2, 0] = 9       # west border, odd rows (offset -> never facing)
    canv = {(0, 0): Z0, (1, 0): Z1}
    got = _sizes(spark, canv, 5)
    assert got == reference_regions(_mosaic(canv), 5)
    assert all(s == 1 for s in got)  # all singletons


def test_deterministic_across_parallelism(spark):
    n = TILE_PX
    rng = np.random.default_rng(33)
    canv = {(tx, 0): (rng.random((n, n)) < 0.45).astype(np.uint16) * 90
            for tx in range(3)}
    df = _tiles_df(spark, canv)
    a = sorted((r.px, r.n_labels) for r in raster_regions(df.repartition(1), 50).collect())
    b = sorted((r.px, r.n_labels) for r in raster_regions(df.repartition(5), 50).collect())
    assert a == b


def test_registered_threshold_selects_mixed_mask():
    """Guard against the r4 vacuous-driver-rows bug: the registered query
    thresholds the Sentinel-like mosaic at 1500, which must select a
    non-empty, non-full foreground on real synthetic pixels."""
    from data_model_spark.sources.images import synth_pixels

    px = synth_pixels("img-000000", 512, 512)
    frac = float((px >= 1500).mean())
    assert 0.01 < frac < 0.99, frac


def test_region_stats_match_global_reference(spark):
    n = TILE_PX
    rng = np.random.default_rng(21)
    # 2x2 mosaic at tile coords (5..6, 8..9) with seam-crossing blobs
    canv = {
        (tx, ty): (rng.random((n, n)) < 0.40).astype(np.uint16) * 70
        for tx in (5, 6)
        for ty in (8, 9)
    }
    got = {
        (r.px, r.minx, r.maxx, r.miny, r.maxy,
         int(round(r.cx * r.px)), int(round(r.cy * r.px)))
        for r in raster_region_stats(_tiles_df(spark, canv), 50).collect()
    }
    want = reference_region_stats(_mosaic(canv), 50, tx0=5, ty_max=9)
    assert got == want


def test_region_stats_seam_centroid_exact(spark):
    # one 2-tile horizontal bar crossing the vertical seam: exact bbox
    # and centroid are hand-computable
    n = TILE_PX
    A = np.zeros((n, n), dtype=np.uint16)
    B = np.zeros((n, n), dtype=np.uint16)
    A[10, n - 4 :] = 9  # gx 0*n + (n-4..n-1), gy = n-1-10
    B[10, :6] = 9       # gx 1*n + (0..5)
    rows = raster_region_stats(
        _tiles_df(spark, {(0, 0): A, (1, 0): B}), 5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    xs = list(range(n - 4, n)) + list(range(n, n + 6))
    assert (r.px, r.n_labels) == (10, 2)
    assert (r.minx, r.maxx) == (n - 4, n + 5)
    assert r.miny == r.maxy == n - 1 - 10
    assert r.cx == sum(xs) / 10 and r.cy == n - 11


def test_layers_never_merge(spark):
    """Two vars covering the SAME tile coords are independent labeling
    domains (regression: pre-gi packing, their labels collided and
    cross-band regions silently merged)."""
    n = TILE_PX
    Z = np.zeros((n, n), dtype=np.uint16)
    Z[5, :] = 9  # one full-width bar per tile
    rows = [
        (var, 0, tx, 0, Z.astype(">u2").tobytes())
        for var in ("b04", "b07")
        for tx in (0, 1)
    ]
    df = spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )
    out = raster_regions(df, 5).collect()
    # each var: ONE region of 2 stitched bars (2*n px) — not one of 4
    assert sorted((r.px, r.n_labels) for r in out) == [(2 * n, 2), (2 * n, 2)]
