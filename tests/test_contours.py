"""Marching-squares tests: per-tile case-canvas equality with the global
zero-padded reference (cross-tile blocks included), analytic ring golden,
saddle counting, and parallelism determinism."""

import numpy as np

from data_model_spark.operators.contours import contour_tiles, ms_cases, reference_cases
from data_model_spark.operators.tiling import TILE_PX


def _tiles_df(spark, canvases):
    rows = [
        ("dem", 0, tx, ty, Z.astype(">u2").tobytes())
        for (tx, ty), Z in canvases.items()
    ]
    return spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )


def _mosaic(canvases):
    txs = sorted({tx for tx, _ in canvases})
    tys = sorted({ty for _, ty in canvases}, reverse=True)
    n = TILE_PX
    G = np.zeros((len(tys) * n, len(txs) * n), dtype=np.uint16)
    for (tx, ty), Z in canvases.items():
        G[tys.index(ty) * n : tys.index(ty) * n + n,
          txs.index(tx) * n : txs.index(tx) * n + n] = Z
    return G, txs, tys


def test_matches_global_reference_2x2(spark):
    n = TILE_PX
    rng = np.random.default_rng(5)
    canv = {
        (tx, ty): rng.integers(0, 100, size=(n, n)).astype(np.uint16)
        for tx in (0, 1)
        for ty in (4, 5)
    }
    G, txs, tys = _mosaic(canv)
    ref = reference_cases(G, 50)
    out = {(r.tile_x, r.tile_y): r for r in contour_tiles(_tiles_df(spark, canv), 50).collect()}
    assert set(out) == set(canv)
    for (tx, ty), r in out.items():
        r0, c0 = tys.index(ty) * n, txs.index(tx) * n
        cases = np.frombuffer(r.cases, dtype=np.uint8).reshape(n, n)
        assert np.array_equal(cases, ref[r0 : r0 + n, c0 : c0 + n]), (tx, ty)


def test_ring_golden(spark):
    # a filled disk: contour cells form a closed ring; every block is a
    # single-segment case (no saddles on a convex shape at this size)
    n = TILE_PX
    yy, xx = np.mgrid[0:n, 0:n]
    Z = ((xx - 128) ** 2 + (yy - 128) ** 2 <= 60 ** 2).astype(np.uint16) * 100
    out = contour_tiles(_tiles_df(spark, {(0, 0): Z}), 50).collect()[0]
    cases = np.frombuffer(out.cases, dtype=np.uint8).reshape(n, n)
    want = ms_cases(np.pad(Z.astype(np.int64), 1), 50)
    assert np.array_equal(cases, want)
    assert out.n_cross == out.n_segments  # convex -> no 2-segment saddles
    assert out.n_cross > 200  # the ring exists


def test_saddle_counts_two_segments(spark):
    n = TILE_PX
    Z = np.zeros((n, n), dtype=np.uint16)
    Z[10, 10] = 100  # tl
    Z[11, 11] = 100  # br -> block (10,10) is case 10 (tl+br): saddle
    out = contour_tiles(_tiles_df(spark, {(0, 0): Z}), 50).collect()[0]
    cases = np.frombuffer(out.cases, dtype=np.uint8).reshape(n, n)
    assert cases[10, 10] == 10
    # the saddle block contributes 2 where plain crossings contribute 1
    from data_model_spark.operators.contours import _SEGS

    assert out.n_segments == int(_SEGS[cases].sum())
    assert out.n_segments > out.n_cross


def test_deterministic_across_parallelism(spark):
    n = TILE_PX
    rng = np.random.default_rng(8)
    canv = {(tx, 0): rng.integers(0, 100, (n, n)).astype(np.uint16) for tx in range(3)}
    df = _tiles_df(spark, canv)
    a = sorted((r.tile_x, r.n_cross, r.n_segments)
               for r in contour_tiles(df.repartition(1), 50).collect())
    b = sorted((r.tile_x, r.n_cross, r.n_segments)
               for r in contour_tiles(df.repartition(5), 50).collect())
    assert a == b
