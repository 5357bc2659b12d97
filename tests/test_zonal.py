"""Zonal statistics vs an independent NumPy clip of every merged tile."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.operators import tiling, zonal
from data_model_spark.sources.images import generate_images_df

TILE_PX = tiling.TILE_PX
PX_M = 10

# tile boundaries are multiples of 2560 m (the scene anchors are NOT —
# anchor x0=600000 sits mid-tile), so aligned zones use 2560-multiples
ZONES = {
    # exactly tile (234, 1988) — pure interior path where the tile exists
    "z_tile": (234 * 2560, 1988 * 2560, 235 * 2560, 1989 * 2560),
    # unaligned, inside one tile (pure boundary path)
    "z_sub": (600130, 5090070, 601000, 5090550),
    # spans several tiles incl. full row 1989 (interior + boundary mix)
    "z_wide": (600640, 5090320, 608960, 5094500),
    # degenerate (empty) zone
    "z_empty": (600000, 5090000, 600000, 5092560),
}


@pytest.fixture(scope="module")
def merged(spark):
    images = generate_images_df(spark, 48)
    m = tiling.merge_tiles(tiling.build_tiles(images, repartition=False))
    m = m.filter(F.col("level") == 0).cache()
    m.count()
    yield m
    m.unpersist()


def _numpy_truth(merged_rows):
    """Clip every merged level-0 tile against every zone, no path split."""
    want = {}
    for row in merged_rows:
        canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
        tile_m = TILE_PX * PX_M
        for zid, (x0, y0, x1, y1) in ZONES.items():
            if x1 <= x0 or y1 <= y0:
                continue
            c0 = max(0, -((-(x0 - row.tile_x * tile_m)) // PX_M))
            c1 = min(TILE_PX, (x1 - row.tile_x * tile_m) // PX_M)
            r0 = max(0, -((-((row.tile_y + 1) * tile_m - y1)) // PX_M))
            r1 = min(TILE_PX, ((row.tile_y + 1) * tile_m - y0) // PX_M)
            if c1 <= c0 or r1 <= r0:
                continue
            block = canvas[r0:r1, c0:c1].astype(np.float64)
            key = (zid, row.var)
            n, s = want.get(key, (0, 0.0))
            want[key] = (n + block.size, s + block.sum())
    return want


def test_zonal_matches_numpy(spark, merged):
    zones = zonal.zones_df(spark, ZONES)
    got = {
        (r.zone_id, r.var): (r.n_px, r.px_sum, r.px_mean)
        for r in zonal.zonal_stats(merged, zones, level=0).collect()
    }
    want = _numpy_truth(merged.collect())
    assert set(got) == set(want)
    assert want, "fixture produced no zone overlaps"
    for key, (n, s) in want.items():
        assert got[key][0] == n, key
        assert got[key][1] == pytest.approx(s, abs=1e-6), key
        assert got[key][2] == pytest.approx(s / n, rel=1e-12), key


def test_both_paths_exercised(spark, merged):
    """The fixture must cover the metadata-only AND the decode path."""
    zones = zonal.zones_df(spark, ZONES)
    tile_m = TILE_PX * PX_M
    rows = merged.select("tile_x", "tile_y").distinct().collect()
    interior = boundary = 0
    for row in rows:
        for x0, y0, x1, y1 in ZONES.values():
            tx0, ty0 = row.tile_x * tile_m, row.tile_y * tile_m
            if tx0 >= x1 or tx0 + tile_m <= x0 or ty0 >= y1 or ty0 + tile_m <= y0:
                continue
            if x0 <= tx0 and tx0 + tile_m <= x1 and y0 <= ty0 and ty0 + tile_m <= y1:
                interior += 1
            else:
                boundary += 1
    assert interior > 0 and boundary > 0
    # and the split agrees with the engine's full-window predicate count
    out = zonal.zonal_stats(merged, zones, level=0)
    assert out.count() > 0


def test_decode_all_equals_split_path(spark, merged):
    zones = zonal.zones_df(spark, ZONES)
    fast = {
        (r.zone_id, r.var): (r.n_px, r.px_sum)
        for r in zonal.zonal_stats(merged, zones, level=0).collect()
    }
    slow = {
        (r.zone_id, r.var): (r.n_px, r.px_sum)
        for r in zonal.zonal_stats(merged, zones, level=0, decode_all=True).collect()
    }
    assert fast.keys() == slow.keys()
    for k, (n, s) in fast.items():
        assert slow[k][0] == n
        assert slow[k][1] == pytest.approx(s, abs=1e-6)


def test_empty_zone_absent(spark, merged):
    zones = zonal.zones_df(spark, {"z_empty": ZONES["z_empty"]})
    assert zonal.zonal_stats(merged, zones, level=0).count() == 0


def test_level1_consistent_mean(spark):
    """At level 1 the mean over an aligned zone stays close to level 0
    (block-mean downsampling preserves large-area means for reflectance).

    Only the larger scenes carry a level-1 pyramid (min_dimension cutoff),
    so the zone is the bbox of the actual level-1 tiles — aligned to the
    level-1 grid, hence also to level 0's — giving both levels the same
    ground window."""
    images = generate_images_df(spark, 12)
    m = tiling.merge_tiles(tiling.build_tiles(images, repartition=False))
    tile1_m = TILE_PX * PX_M * 2
    ext = m.filter(F.col("level") == 1).agg(
        F.min("tile_x"), F.min("tile_y"), F.max("tile_x"), F.max("tile_y")
    ).collect()[0]
    zones = zonal.zones_df(
        spark,
        {"z": (ext[0] * tile1_m, ext[1] * tile1_m,
               (ext[2] + 1) * tile1_m, (ext[3] + 1) * tile1_m)},
    )
    l0 = {
        (r.zone_id, r.var): (r.px_sum, r.px_mean)
        for r in zonal.zonal_stats(m.filter(F.col("level") == 0), zones, level=0).collect()
    }
    l1 = {
        (r.zone_id, r.var): (r.px_sum, r.px_mean)
        for r in zonal.zonal_stats(m.filter(F.col("level") == 1), zones, level=1).collect()
    }
    shared = set(l0) & set(l1)
    assert shared
    checked = 0
    for k in shared:
        if l0[k][1] > 100:  # reflectance bands; class/probability bands skip
            # block-mean conserves the pixel SUM (x4 per level): every 2x2
            # block is full (even scene dims) and zone edges align to the
            # level-1 grid, so only uint16 rounding separates the two.
            # Means are NOT compared — canvas zero-fill fractions differ
            # between levels wherever a level-1 tile spans ground that only
            # some of its four level-0 sub-tiles cover.
            assert 4.0 * l1[k][0] == pytest.approx(l0[k][0], rel=0.02), k
            checked += 1
    assert checked
