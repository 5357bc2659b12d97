"""Mosaic seam QA: adjacency pairing, exactness, JVM-vs-replay parity."""

import numpy as np

from data_model_spark.operators.seams import seam_features, seam_qa


def _df(spark, tiles):
    rows = [
        {"var": v, "level": 0, "tile_x": tx, "tile_y": ty,
         "data": t.astype(">u2").tobytes()}
        for (v, tx, ty), t in tiles.items()
    ]
    return spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )


def test_replay_continuous_mosaic_zero_seams():
    # one smooth gradient cut into 2x2 tiles: a CONTINUOUS field still
    # has a step of the gradient slope across the cut, never more
    g = np.fromfunction(lambda y, x: 7 * x + 3 * y, (512, 512)).astype(np.uint16)
    tiles = {}
    for ty in (0, 1):
        for tx in (0, 1):
            r0 = (1 - ty) * 256  # row 0 = north edge of tile row ty=1
            tiles[("v", tx, ty)] = g[r0 : r0 + 256, tx * 256 : (tx + 1) * 256]
    rows = seam_features(tiles)
    assert len(rows) == 4  # 2 horizontal + 2 vertical adjacencies
    for var, orient, tx, ty, sad, maxad in rows:
        assert maxad == (7 if orient == "H" else 3)
        assert sad == 256 * maxad


def test_replay_discontinuity_detected():
    a = np.full((256, 256), 100, np.uint16)
    b = np.full((256, 256), 900, np.uint16)
    rows = seam_features({("v", 0, 0): a, ("v", 1, 0): b})
    assert rows == [("v", "H", 0, 0, 256 * 800, 800)]


def test_replay_no_false_adjacency():
    # diagonal-only neighbors produce no seam rows
    a = np.full((256, 256), 5, np.uint16)
    assert seam_features({("v", 0, 0): a, ("v", 1, 1): a.copy()}) == []
    # different vars never pair
    assert seam_features({("a", 0, 0): a, ("b", 1, 0): a.copy()}) == []


def test_distributed_matches_replay(spark):
    rng = np.random.default_rng(13)
    tiles = {
        ("v", tx, ty): rng.integers(0, 65536, (256, 256), dtype=np.uint16)
        for tx in (2, 3, 4)
        for ty in (7, 8)
    }
    del tiles[("v", 4, 8)]  # a gap: (4,7) keeps only its west seam
    got = sorted(
        (r.var, r.orient, r.tile_x, r.tile_y, r.sad, r.maxad)
        for r in seam_qa(_df(spark, tiles)).collect()
    )
    assert got == sorted(seam_features(tiles))
    assert len(got) == 3 + 2  # H: (2,7)(2,8)(3,7); V: (2,7)(3,7)
