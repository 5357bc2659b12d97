"""Watershed basin labeling: kernel goldens, outlet path, engine==replay."""

import numpy as np

from data_model_spark.operators.basins import (
    _OUT_CONST,
    _stage1_compute,
    basin_tiles,
    reference_basins,
)
from data_model_spark.operators.tiling import TILE_PX


def _tiles_df(spark, canvases):
    rows = [
        ("dem", 0, tx, ty, Z.astype(">u2").tobytes())
        for (tx, ty), Z in canvases.items()
    ]
    return spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )


def test_kernel_walled_ramp_single_pit():
    """High halo walls + a strict bowl: every pixel drains to the one
    pit, nothing exits, and the pit-coordinate sums are exact."""
    n = TILE_PX
    P = np.full((n + 2, n + 2), 10**6, dtype=np.int64)
    r, c = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    # strictly decreasing toward (40, 70): L1 bowl
    P[1:-1, 1:-1] = 10000 + 3 * (np.abs(r - 40) + np.abs(c - 70))
    out = _stage1_compute(P, 8)
    assert out["n_pits"] == 1
    assert out["n_pix_local"] == n * n
    assert out["exits"] == []
    assert out["sum_pr"] == 40 * n * n
    assert out["sum_pc"] == 70 * n * n
    # every border-ring pixel maps to the same in-tile pit
    assert all(m["pit"] and (m["tr"], m["tc"]) == (40, 70) for m in out["bmap"])


def test_kernel_plateau_exits_only_from_ring():
    """Uniform plateau over zero halo: interior pixels are pits; the
    1020 ring pixels each exit to an adjacent outside cell."""
    n = TILE_PX
    P = np.zeros((n + 2, n + 2), dtype=np.int64)
    P[1:-1, 1:-1] = 500
    out = _stage1_compute(P, 0)
    ring = 4 * n - 4
    assert out["n_pits"] == n * n - ring
    assert out["n_pix_local"] == n * n - ring
    assert sum(e["n"] for e in out["exits"]) == ring
    assert all(not m["pit"] for m in out["bmap"])


def test_two_tile_eastward_river_drains_out(spark):
    """Columns strictly decreasing eastward across two tiles: interior
    rows flow E through BOTH tiles and off the stored mosaic (a 2-hop
    boundary-closure chain: A-exit -> B border -> nonexistent tile ->
    outlet); ring pixels fall off their nearest zero-halo edge.  Checks
    the full Spark path against an independent per-pixel replay."""
    n = TILE_PX
    c = np.arange(n, dtype=np.uint16)
    A = np.tile(2000 - c, (n, 1)).astype(np.uint16)  # tx=0: 2000..1745
    B = np.tile(1744 - c, (n, 1)).astype(np.uint16)  # tx=1: 1744..1489
    got = {
        (r.tile_x, r.tile_y): r
        for r in basin_tiles(
            _tiles_df(spark, {(0, 0): A, (1, 0): B})
        ).collect()
    }
    assert set(got) == {(0, 0), (1, 0)}
    for (tx, _), row in got.items():
        assert row.n_pits == 0
        assert row.n_pix_out == n * n
        # independent label replay: row 0 -> north out (-1, gc); row 255
        # -> south out (256, gc); col 0 of A / col 255 of B -> west/east
        # out; every other pixel -> east out at (r, 512)
        # mosaic corners follow the D8 tie-break among equal zero-halo
        # drops (first straight taken survives later equal straights)
        corners = {
            (0, 0, 0): (0, -1),          # W wins at A's NW corner
            (0, n - 1, 0): (n, 0),       # S wins at A's SW corner
            (1, 0, n - 1): (0, 2 * n),   # E wins at B's NE corner
            (1, n - 1, n - 1): (n - 1, 2 * n),  # E wins at B's SE corner
        }
        fp = 0
        for r in range(n):
            for cc in range(n):
                gc = tx * n + cc
                if (tx, r, cc) in corners:
                    lbl = corners[(tx, r, cc)]
                elif r == 0:
                    lbl = (-1, gc)
                elif r == n - 1:
                    lbl = (n, gc)
                elif tx == 0 and cc == 0:
                    lbl = (r, -1)
                else:
                    lbl = (r, 2 * n)
                fp += 131 * lbl[0] + 17 * lbl[1] + _OUT_CONST
        assert row.basin_fp == fp


def test_engine_equals_global_replay(spark):
    """Full distributed path == the global-mosaic pointer replay on the
    8-scene fixture (27 tiles, real cross-tile drainage)."""
    got = sorted(
        tuple(r) for r in basin_tiles(_merged_tiles_n(spark, 8)).collect()
    )
    want = sorted(reference_basins(8))
    assert got == want


def _merged_tiles_n(spark, n_images):
    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.sources.images import generate_images_df

    images = generate_images_df(spark, n_images)
    return tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter(F.col("level") == 0)


def test_single_task_closure_matches_distributed(spark, monkeypatch):
    from data_model_spark.operators import basins as bmod
    from data_model_spark.operators.hydrology import _merged_tiles

    tiles = _merged_tiles(spark)
    fast = sorted(map(tuple, bmod.basin_tiles(tiles).collect()))
    monkeypatch.setattr(bmod, "_BASIN_SMALL_BMAP", 0)  # force doubling rounds
    slow = sorted(map(tuple, bmod.basin_tiles(tiles).collect()))
    assert fast == slow and len(fast) > 0
