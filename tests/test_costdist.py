"""Cost-distance tests: per-tile equality with the sequential global
multi-source Dijkstra (random mosaics, a cheap valley routing around an
expensive ridge across tile borders), sweep-fixpoint unit checks,
unreachable pixels, and parallelism determinism."""

import numpy as np

from data_model_spark.operators.costdist import (
    INF,
    cost_distance,
    reference_cost_distance,
    sweep_fixpoint,
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


def _ref_tile_stats(canvases, thr):
    G = _mosaic(canvases)
    D = reference_cost_distance(G, thr)
    txs = sorted({tx for tx, _ in canvases})
    tys = sorted({ty for _, ty in canvases}, reverse=True)
    n = TILE_PX
    out = {}
    for (tx, ty) in canvases:
        blk = D[tys.index(ty) * n : (tys.index(ty) + 1) * n,
                txs.index(tx) * n : (txs.index(tx) + 1) * n]
        fin = blk[blk < INF]
        out[(tx, ty)] = (
            int(fin.size), int(fin.sum()), int(fin.max()) if fin.size else -1
        )
    return out


def _spark_tile_stats(spark, canvases, thr):
    return {
        (r.tile_x, r.tile_y): (r.reached, r.dist_sum, r.dist_max)
        for r in cost_distance(_tiles_df(spark, canvases), thr).collect()
    }


def test_sweep_fixpoint_is_tile_dijkstra():
    import heapq

    rng = np.random.default_rng(7)
    cost = rng.integers(1, 20, (40, 40)).astype(np.int64)
    dist = np.full((40, 40), INF, dtype=np.int64)
    dist[5, 5] = 0
    dist[30, 33] = 0
    got = sweep_fixpoint(cost, dist)
    # heapq truth
    d = np.full(1600, INF, dtype=np.int64)
    d[5 * 40 + 5] = 0
    d[30 * 40 + 33] = 0
    pq = [(0, 5 * 40 + 5), (0, 30 * 40 + 33)]
    c = cost.ravel()
    while pq:
        du, u = heapq.heappop(pq)
        if du > d[u]:
            continue
        r, col = divmod(u, 40)
        for nr, nc in ((r - 1, col), (r + 1, col), (r, col - 1), (r, col + 1)):
            if 0 <= nr < 40 and 0 <= nc < 40:
                v = nr * 40 + nc
                if du + c[v] < d[v]:
                    d[v] = du + c[v]
                    heapq.heappush(pq, (d[v], v))
    assert np.array_equal(got.ravel(), d)


def test_random_2x2_mosaic_matches_dijkstra(spark):
    n = TILE_PX
    rng = np.random.default_rng(11)
    canv = {
        (tx, ty): rng.integers(0, 5000, (n, n)).astype(np.uint16)
        for tx in (0, 1)
        for ty in (0, 1)
    }
    # sprinkle a handful of sources
    for (tx, ty), Z in canv.items():
        for _ in range(3):
            Z[rng.integers(0, n), rng.integers(0, n)] = 60000
    assert _spark_tile_stats(spark, canv, 50000) == _ref_tile_stats(canv, 50000)


def test_valley_routes_around_ridge_across_tiles(spark):
    # source in the west tile; an expensive ridge splits the east tile
    # except for a cheap valley along the south edge — the least-cost
    # path must cross the border, run the valley, and climb back north.
    n = TILE_PX
    W = np.full((n, n), 2000, dtype=np.uint16)
    E = np.full((n, n), 2000, dtype=np.uint16)
    E[: n - 4, n // 2] = 60000        # ridge column, gap at the south
    E[n - 4 :, :] = 300               # cheap southern valley
    W[n // 2, 0] = 61000              # source on the west edge
    canv = {(0, 0): W, (1, 0): E}
    assert _spark_tile_stats(spark, canv, 60500) == _ref_tile_stats(canv, 60500)


def test_no_sources_all_unreachable(spark):
    n = TILE_PX
    canv = {(0, 0): np.full((n, n), 100, dtype=np.uint16)}
    got = _spark_tile_stats(spark, canv, 50000)
    assert got == {(0, 0): (0, 0, -1)}


def test_deterministic_across_parallelism(spark):
    n = TILE_PX
    rng = np.random.default_rng(3)
    canv = {
        (tx, 0): rng.integers(0, 3000, (n, n)).astype(np.uint16) for tx in range(3)
    }
    canv[(0, 0)][10, 10] = 65000
    df = _tiles_df(spark, canv)
    a = sorted(map(tuple, cost_distance(df.repartition(1), 60000).collect()))
    b = sorted(map(tuple, cost_distance(df.repartition(5), 60000).collect()))
    assert a == b
