"""Polygon zonal statistics vs per-pixel ray-cast truth over every tile."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.functions import geometry as G
from data_model_spark.operators import tiling, zonal
from data_model_spark.sources.images import generate_images_df

TILE_PX = tiling.TILE_PX
PX_M = 10
TILE_M = TILE_PX * PX_M

POLYS = {
    # tall triangle: full interior tiles plus sloped boundary tiles
    "tri": np.array(
        [[601000, 5089000], [640000, 5089000], [620000, 5096000]], dtype=float
    ),
    # concave L: corners-inside-but-vertex-inside tiles must NOT be "full"
    "ell": np.array(
        [
            [660000, 5089500], [680000, 5089500], [680000, 5092000],
            [670000, 5092000], [670000, 5094500], [660000, 5094500],
        ],
        dtype=float,
    ),
    # sub-tile sliver
    "tiny": np.array(
        [[600100, 5090100], [600900, 5090150], [600500, 5090800]], dtype=float
    ),
    # fully outside the mosaic
    "out": np.array(
        [[900000, 5089000], [910000, 5089000], [905000, 5096000]], dtype=float
    ),
}


@pytest.fixture(scope="module")
def merged(spark):
    m = tiling.merge_tiles(
        tiling.build_tiles(generate_images_df(spark, 48), repartition=False)
    ).filter(F.col("level") == 0).cache()
    m.count()
    yield m
    m.unpersist()


def _truth(rows):
    """Pure per-pixel center-in-polygon accumulation — no tile
    classification, no metadata shortcut."""
    want = {}
    for row in rows:
        canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
        xs = row.tile_x * TILE_M + (np.arange(TILE_PX) + 0.5) * PX_M
        ys = (row.tile_y + 1) * TILE_M - (np.arange(TILE_PX) + 0.5) * PX_M
        gx, gy = np.meshgrid(xs, ys)
        for zid, poly in POLYS.items():
            mask = G.points_in_polygon(gx.ravel(), gy.ravel(), poly).reshape(
                TILE_PX, TILE_PX
            )
            if not mask.any():
                continue
            key = (zid, row.var)
            n, s = want.get(key, (0, 0.0))
            want[key] = (n + int(mask.sum()),
                         s + float(canvas[mask].astype(np.float64).sum()))
    return want


def test_poly_zonal_matches_pixel_truth(spark, merged):
    got = {
        (r.zone_id, r.var): (r.n_px, r.px_sum, r.px_mean)
        for r in zonal.zonal_stats_poly(merged, POLYS, level=0).collect()
    }
    want = _truth(merged.collect())
    assert want and set(got) == set(want)
    assert not any(z == "out" for z, _ in got)
    for key, (n, s) in want.items():
        assert got[key][0] == n, key
        assert got[key][1] == pytest.approx(s, abs=1e-6), key
        assert got[key][2] == pytest.approx(s / n, rel=1e-12), key


def test_both_paths_exercised(spark, merged):
    """The triangle fixture must classify some tiles full AND some partial
    (the metadata path is only proven if it actually runs)."""
    keys = {(r.tile_x, r.tile_y) for r in
            merged.select("tile_x", "tile_y").distinct().collect()}
    poly = POLYS["tri"]
    full = part = 0
    for tx, ty in keys:
        lo = np.array([tx * TILE_M]), np.array([ty * TILE_M])
        hi = np.array([(tx + 1) * TILE_M]), np.array([(ty + 1) * TILE_M])
        if not G.rects_intersect_polygon(lo[0], lo[1], hi[0], hi[1], poly)[0]:
            continue
        cx = np.array([lo[0][0], hi[0][0], lo[0][0], hi[0][0]])
        cy = np.array([lo[1][0], lo[1][0], hi[1][0], hi[1][0]])
        if G.points_in_polygon(cx, cy, poly).all():
            full += 1
        else:
            part += 1
    assert full > 0 and part > 0


def test_concave_vertex_tile_not_full(spark, merged):
    """The tile containing the L's reflex corner (670000, 5092000) has all
    4 corners inside yet is NOT fully covered — the vertex-in-tile guard
    must route it through the decode path (truth equality in the first
    test would catch the miscount; this pins the mechanism)."""
    tx, ty = 670000 // TILE_M, 5092000 // TILE_M
    poly = POLYS["ell"]
    cx = np.array([tx * TILE_M, (tx + 1) * TILE_M, tx * TILE_M, (tx + 1) * TILE_M],
                  dtype=float)
    cy = np.array([ty * TILE_M, ty * TILE_M, (ty + 1) * TILE_M, (ty + 1) * TILE_M],
                  dtype=float)
    if G.points_in_polygon(cx, cy, poly).all():
        # reflex vertex sits strictly inside this tile => not full
        vx, vy = poly[:, 0], poly[:, 1]
        inside = ((vx > tx * TILE_M) & (vx < (tx + 1) * TILE_M)
                  & (vy > ty * TILE_M) & (vy < (ty + 1) * TILE_M))
        assert inside.any()


def test_level1_poly(spark):
    """Polygon zonal at a coarser level uses that level's pixel geometry."""
    m = tiling.merge_tiles(
        tiling.build_tiles(generate_images_df(spark, 48), repartition=False)
    )
    l1 = m.filter(F.col("level") == 1)
    out = zonal.zonal_stats_poly(l1, {"tri": POLYS["tri"]}, level=1).collect()
    assert out
    for r in out:
        assert r.n_px > 0 and np.isfinite(r.px_mean)


def test_notch_tile_not_full(spark, merged):
    """A polygon with a thin notch dipping across one tile side — both
    notch vertices OUTSIDE the tile, all 4 tile corners inside — must
    route that tile through the decode path and still match pixel truth.
    (Corner and vertex-in-tile tests alone misclassify it as full.)"""
    # tile (236, 1988): x [604160, 606720), y [5089280, 5091840)
    tx0, ty0 = 236 * TILE_M, 1988 * TILE_M
    notch = np.array(
        [
            [tx0 - 5000, ty0 - 5000],
            [tx0 + 10000, ty0 - 5000],
            [tx0 + 10000, ty0 + 10000],
            # thin notch piercing the whole tile top-to-bottom: both notch
            # vertices lie outside the tile (above / below), its sides
            # cross the tile's north and south edges between the corners
            [tx0 + 1400, ty0 + 10000],
            [tx0 + 1280, ty0 - 300],
            [tx0 + 1160, ty0 + 10000],
            [tx0 - 5000, ty0 + 10000],
        ],
        dtype=float,
    )
    # fixture sanity: 4 corners in, no vertex strictly inside the tile
    cx = np.array([tx0, tx0 + TILE_M, tx0, tx0 + TILE_M], dtype=float)
    cy = np.array([ty0, ty0, ty0 + TILE_M, ty0 + TILE_M], dtype=float)
    assert G.points_in_polygon(cx, cy, notch).all()
    vx, vy = notch[:, 0], notch[:, 1]
    assert not (
        (vx > tx0) & (vx < tx0 + TILE_M) & (vy > ty0) & (vy < ty0 + TILE_M)
    ).any()

    got = {
        (r.zone_id, r.var): (r.n_px, r.px_sum)
        for r in zonal.zonal_stats_poly(merged, {"nz": notch}, level=0).collect()
    }
    # truth: pure per-pixel over every tile
    want = {}
    for row in merged.collect():
        canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
        xs = row.tile_x * TILE_M + (np.arange(TILE_PX) + 0.5) * PX_M
        ys = (row.tile_y + 1) * TILE_M - (np.arange(TILE_PX) + 0.5) * PX_M
        gx, gy = np.meshgrid(xs, ys)
        mask = G.points_in_polygon(gx.ravel(), gy.ravel(), notch).reshape(
            TILE_PX, TILE_PX
        )
        if not mask.any():
            continue
        key = ("nz", row.var)
        n, s = want.get(key, (0, 0.0))
        want[key] = (n + int(mask.sum()),
                     s + float(canvas[mask].astype(np.float64).sum()))
    assert set(got) == set(want) and want
    for k, (n, s) in want.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(s, abs=1e-6), k
