"""Hydrology tests: distributed == zero-padded global-mosaic reference for
both D8 directions and flow accumulation (real image mosaic + synthetic
DEMs with cross-tile and re-entrant flow), exact-comparator unit cases,
mass bounds, and parallelism determinism."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import tiling
from data_model_spark.operators.hydrology import (
    _propagate,
    d8_directions,
    flow_accumulation,
    flow_direction,
    reference_accumulation,
)
from data_model_spark.operators.tiling import TILE_PX
from data_model_spark.sources.images import generate_images_df


def _tiles_df(spark, canvases):
    """canvases: {(tile_x, tile_y): uint16 (256,256)} -> merged-like frame."""
    rows = [
        ("dem", 0, tx, ty, Z.astype(">u2").tobytes())
        for (tx, ty), Z in canvases.items()
    ]
    return spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )


def _mosaic(canvases):
    """Assemble the global mosaic (tile_y+1 is north => lower canvas rows)."""
    txs = sorted({tx for tx, _ in canvases})
    tys = sorted({ty for _, ty in canvases}, reverse=True)  # north first
    n = TILE_PX
    G = np.zeros((len(tys) * n, len(txs) * n), dtype=np.uint16)
    for (tx, ty), Z in canvases.items():
        r0 = tys.index(ty) * n
        c0 = txs.index(tx) * n
        G[r0 : r0 + n, c0 : c0 + n] = Z
    return G, txs, tys


def _check_equal(spark, canvases):
    G, txs, tys = _mosaic(canvases)
    dref, aref = reference_accumulation(G)
    n = TILE_PX
    out = {(r.tile_x, r.tile_y): r for r in flow_accumulation(_tiles_df(spark, canvases)).collect()}
    assert set(out) == set(canvases)
    for (tx, ty), r in out.items():
        r0, c0 = tys.index(ty) * n, txs.index(tx) * n
        acc = np.frombuffer(r.acc, dtype=np.int64).reshape(n, n)
        assert np.array_equal(acc, aref[r0 : r0 + n, c0 : c0 + n]), (tx, ty)
    return aref


def test_east_ramp_cross_tile(spark):
    n = TILE_PX
    canv = {}
    for tx in range(2):
        Z = np.zeros((n, n), dtype=np.uint16)
        for c in range(n):
            Z[:, c] = 60000 - (tx * n + c) * 10
        canv[(tx, 5)] = Z
    aref = _check_equal(spark, canv)
    assert aref.max() == 2 * n - 2  # longest interior east chain


def test_reentrant_flow_across_tiles(spark):
    # a V-valley along the tile seam: flow zigzags between the two tiles
    # (west tile drains east, east tile's west strip drains back west at
    # lower rows), exercising multi-round cross-tile iteration
    n = TILE_PX
    rng = np.random.default_rng(7)
    base = rng.integers(30000, 31000, size=(n, 2 * n)).astype(np.uint16)
    for c in range(2 * n):
        base[:, c] = base[:, c] + abs(c - n) * 50  # valley at the seam
    for r in range(n):
        base[r, :] = base[r, :] + (n - r) * 20  # tilt southward along seam
    canv = {(0, 5): base[:, :n], (1, 5): base[:, n:]}
    _check_equal(spark, canv)


def test_2x2_mosaic_random(spark):
    n = TILE_PX
    rng = np.random.default_rng(42)
    canv = {
        (tx, ty): rng.integers(0, 5000, size=(n, n)).astype(np.uint16)
        for tx in (3, 4)
        for ty in (7, 8)
    }
    _check_equal(spark, canv)


def test_real_mosaic_matches_reference(spark):
    images = generate_images_df(spark, 12)
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter((F.col("level") == 0) & (F.col("var") == "b01"))
    rows = merged.collect()
    if not rows:
        pytest.skip("no b01 tiles in fixture")
    from data_model_spark.codecs import decode_image

    canv = {
        (r.tile_x, r.tile_y): decode_image(r.data, "raw-u16", TILE_PX, TILE_PX)
        for r in rows
    }
    # reference needs a full rectangle: missing positions are zero tiles,
    # which are inert (every zero cell is a pit), so equality holds on
    # stored tiles
    G, txs, tys = _mosaic(canv)
    dref, aref = reference_accumulation(G)
    out = {
        (r.tile_x, r.tile_y): r
        for r in flow_accumulation(merged).collect()
    }
    n = TILE_PX
    for (tx, ty), r in out.items():
        r0, c0 = tys.index(ty) * n, txs.index(tx) * n
        acc = np.frombuffer(r.acc, dtype=np.int64).reshape(n, n)
        assert np.array_equal(acc, aref[r0 : r0 + n, c0 : c0 + n]), (tx, ty)
    # direction layer against the same reference
    fd = {(r.tile_x, r.tile_y): r for r in flow_direction(merged).collect()}
    for (tx, ty), r in fd.items():
        r0, c0 = tys.index(ty) * n, txs.index(tx) * n
        dirs = np.frombuffer(r.dirs, dtype=np.uint8).reshape(n, n)
        assert np.array_equal(dirs, dref[r0 : r0 + n, c0 : c0 + n]), (tx, ty)


def test_d8_exact_comparator_units():
    # diagonal drop must exceed sqrt(2) * cardinal drop to win:
    # cardinal 5 vs diagonal 7 -> 2*25=50 > 49 -> cardinal (E) wins;
    # cardinal 5 vs diagonal 8 -> 50 < 64 -> diagonal (SE) wins
    P = np.full((3, 3), 100, dtype=np.int64)
    P[1, 2] = 95   # E drop 5
    P[2, 2] = 93   # SE drop 7
    assert d8_directions(P)[0, 0] == 1
    P[2, 2] = 92   # SE drop 8
    assert d8_directions(P)[0, 0] == 2
    # tie between E and S (equal cardinal drops): E first in scan order
    P = np.full((3, 3), 100, dtype=np.int64)
    P[1, 2] = 90
    P[2, 1] = 90
    assert d8_directions(P)[0, 0] == 1
    # all drops <= 0 -> pit
    assert d8_directions(np.zeros((3, 3), dtype=np.int64))[0, 0] == 0


def test_propagate_mass_bound():
    # acc of any cell < number of cells; pits absorb all inflow
    n = TILE_PX
    rng = np.random.default_rng(3)
    Z = rng.integers(0, 1000, size=(n, n)).astype(np.uint16)
    dirs = d8_directions(np.pad(Z.astype(np.int64), 1))
    acc = np.zeros((n, n), dtype=np.int64)
    _propagate(Z, dirs, acc, None)
    assert acc.max() < n * n
    assert (acc >= 0).all()


def test_deterministic_across_parallelism(spark):
    n = TILE_PX
    rng = np.random.default_rng(11)
    canv = {
        (tx, 0): rng.integers(0, 3000, size=(n, n)).astype(np.uint16)
        for tx in range(3)
    }
    df = _tiles_df(spark, canv)
    a = {
        (r.tile_x, r.tile_y): (r.acc_sum, r.acc_max, r.n_pits)
        for r in flow_accumulation(df.repartition(1)).collect()
    }
    b = {
        (r.tile_x, r.tile_y): (r.acc_sum, r.acc_max, r.n_pits)
        for r in flow_accumulation(df.repartition(5)).collect()
    }
    assert a == b
