"""Distributed cost-distance (least-cost accumulated surface).

The classic GIS cost surface (Dijkstra over the raster; ESRI
"Cost Distance"): ``dist(p)`` = minimum over 4-connected paths from any
SOURCE pixel of the sum of the traversal costs of the pixels ENTERED
(sources cost 0 to stand on).  Unlike focal ops this has unbounded
spatial reach — a cheap valley routes cost around an expensive ridge
arbitrarily far — so no halo width works; the distributed form is
monotone asynchronous relaxation (the Bellman-Ford fixpoint argument):

1. each tile relaxes to its INTERNAL fixpoint with vectorized min-plus
   sweeps (``dist = min(dist, shift(dist) + cost)`` in all four
   directions until unchanged — exact integer arithmetic);
2. tiles exchange IMPROVED border distances with their 4 neighbors
   (one explode + one tile-key join, the ``hydrology.flow_accumulation``
   round shape); a receiving tile relaxes entry candidates
   ``d_border + cost(entry)`` and re-sweeps only if something improved;
3. rounds repeat until no border improves — at that fixpoint every
   pixel holds the true global least cost (min-plus relaxation is
   monotone nonincreasing and bounded below by the truth, and any
   shortest path crossing k tile borders is fully relaxed after k
   rounds, so termination is bounded by the max border crossings).

Determinism contract: costs and distances are int64; min-plus is
commutative/associative; the fixpoint is unique — bit-identical at any
parallelism (pinned against a sequential global Dijkstra in
tests/test_costdist.py).

Scale shape: per round only IMPROVED tiles recompute (the left-anti
untouched branch passes through), shuffle volume is border pixels of
improved tiles — O(perimeter); ``localCheckpoint`` truncates lineage.
Rounds are bounded by the mosaic's tile diameter along least-cost
paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from .registry import register
from .tiling import TILE_PX

INF = np.int64(1) << 62


def sweep_fixpoint(cost: np.ndarray, dist: np.ndarray) -> np.ndarray:
    """In-tile min-plus fixpoint: repeat 4-directional vectorized sweeps
    until unchanged.  ``cost`` int64 >= 1; ``dist`` int64 (INF = far).
    Returns the relaxed dist (a NEW array)."""
    d = dist.astype(np.int64, copy=True)
    c = cost
    while True:
        before = d.copy()
        for r in range(1, d.shape[0]):          # from north neighbor
            np.minimum(d[r], d[r - 1] + c[r], out=d[r])
        for r in range(d.shape[0] - 2, -1, -1):  # from south neighbor
            np.minimum(d[r], d[r + 1] + c[r], out=d[r])
        # west->east and east->west need per-column scans; transpose once
        dt, ct = d.T, c.T
        for r in range(1, dt.shape[0]):
            np.minimum(dt[r], dt[r - 1] + ct[r], out=dt[r])
        for r in range(dt.shape[0] - 2, -1, -1):
            np.minimum(dt[r], dt[r + 1] + ct[r], out=dt[r])
        if np.array_equal(d, before):
            return d


_OUT_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("tx", T.IntegerType(), False),
            T.StructField("ty", T.IntegerType(), False),
            T.StructField("entry", T.IntegerType(), False),
            T.StructField("d", T.LongType(), False),
        ]
    )
)

_STATE_FIELDS = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.LongType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("cost", T.BinaryType(), False),
        T.StructField("dist", T.BinaryType(), False),
        T.StructField("n_src", T.LongType(), False),
        T.StructField("outflows", _OUT_T, False),
    ]
)


def _borders(dist: np.ndarray, prev: np.ndarray | None) -> list[dict]:
    """Improved border distances -> neighbor (dtx, dty, entry flat index
    IN THE RECEIVER, d).  Row 0 is the NORTH edge (adjoins tile_y+1)."""
    n = dist.shape[0]
    out = []

    def emit(vec, pvec, dtx, dty, entries):
        mask = vec < INF
        if pvec is not None:
            mask &= vec < pvec
        for i in np.flatnonzero(mask):
            out.append(
                {"tx": dtx, "ty": dty, "entry": int(entries[i]), "d": int(vec[i])}
            )

    cols = np.arange(n)
    emit(dist[0, :], None if prev is None else prev[0, :], 0, 1,
         (n - 1) * n + cols)                       # north -> receiver's south row
    emit(dist[n - 1, :], None if prev is None else prev[n - 1, :], 0, -1, cols)
    emit(dist[:, 0], None if prev is None else prev[:, 0], -1, 0,
         cols * n + (n - 1))                        # west -> receiver's east col
    emit(dist[:, n - 1], None if prev is None else prev[:, n - 1], 1, 0, cols * n)
    return out


def cost_distance(
    tiles: DataFrame, src_threshold: int, max_rounds: int = 64
) -> DataFrame:
    """(var, level, tile_x, tile_y, n_src, reached, dist_sum, dist_max):
    per-tile stats of the exact global least-cost surface.  Pixel
    traversal cost = 1 + (z >> 8); sources are pixels with
    z >= ``src_threshold`` (dist 0)."""

    def init(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                z = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX).astype(np.int64)
                cost = 1 + (z >> 8)
                dist = np.where(z >= src_threshold, np.int64(0), INF)
                n_src = int((dist == 0).sum())
                dist = sweep_fixpoint(cost, dist)
                recs.append(
                    {"var": row.var, "level": int(row.level),
                     "tile_x": int(row.tile_x), "tile_y": int(row.tile_y),
                     "cost": cost.tobytes(), "dist": dist.tobytes(),
                     "n_src": n_src, "outflows": _borders(dist, None)}
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _STATE_FIELDS.fields}
            )

    state = (
        tiles.select("var", "level", "tile_x", "tile_y", "data")
        .mapInPandas(init, _STATE_FIELDS)
        .localCheckpoint()
    )
    keys = ["var", "level", "tile_x", "tile_y"]

    def step(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                cost = np.frombuffer(row.cost, dtype=np.int64).reshape(TILE_PX, TILE_PX)
                dist = np.frombuffer(row.dist, dtype=np.int64).reshape(
                    TILE_PX, TILE_PX
                ).copy()
                flat = dist.ravel()
                improved = False
                for s in row.seeds:
                    cand = s["d"] + cost.ravel()[s["entry"]]
                    if cand < flat[s["entry"]]:
                        flat[s["entry"]] = cand
                        improved = True
                prev = np.frombuffer(row.dist, dtype=np.int64).reshape(
                    TILE_PX, TILE_PX
                )
                outflows = []
                if improved:
                    dist = sweep_fixpoint(cost, dist)
                    outflows = _borders(dist, prev)
                recs.append(
                    {"var": row.var, "level": int(row.level),
                     "tile_x": int(row.tile_x), "tile_y": int(row.tile_y),
                     "cost": row.cost, "dist": dist.tobytes(),
                     "n_src": int(row.n_src), "outflows": outflows}
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _STATE_FIELDS.fields}
            )

    for _ in range(max_rounds):
        pending = state.select(*keys, F.explode("outflows").alias("o")).select(
            "var", "level",
            (F.col("tile_x") + F.col("o.tx")).alias("tile_x"),
            (F.col("tile_y") + F.col("o.ty")).alias("tile_y"),
            F.col("o.entry").alias("entry"),
            F.col("o.d").alias("d"),
        )
        seeds = pending.groupBy(*keys).agg(
            F.collect_list(F.struct("entry", "d")).alias("seeds")
        )
        updated = (
            state.drop("outflows").join(seeds, keys).mapInPandas(step, _STATE_FIELDS)
        )
        untouched = state.join(seeds.select(*keys), keys, "left_anti").withColumn(
            "outflows", F.array().cast(_OUT_T)
        )
        state = updated.unionByName(untouched).localCheckpoint()
        n_out = state.agg(F.sum(F.size("outflows"))).collect()[0][0] or 0
        if n_out == 0:
            break
    else:
        raise RuntimeError(f"cost_distance did not converge in {max_rounds} rounds")

    def stats(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                dist = np.frombuffer(row.dist, dtype=np.int64)
                fin = dist[dist < INF]
                recs.append(
                    {"var": row.var, "level": int(row.level),
                     "tile_x": int(row.tile_x), "tile_y": int(row.tile_y),
                     "n_src": int(row.n_src), "reached": int(fin.size),
                     "dist_sum": int(fin.sum()), "dist_max": int(fin.max()) if fin.size else -1}
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {
                    k: pd.Series(dtype="object")
                    for k in ["var", "level", "tile_x", "tile_y", "n_src",
                              "reached", "dist_sum", "dist_max"]
                }
            )

    return state.mapInPandas(
        stats,
        "var string, level long, tile_x long, tile_y long, n_src long, "
        "reached long, dist_sum long, dist_max long",
    )


def reference_cost_distance(Z: np.ndarray, src_threshold: int) -> np.ndarray:
    """Sequential global truth: multi-source Dijkstra over the mosaic."""
    import heapq

    z = Z.astype(np.int64)
    cost = 1 + (z >> 8)
    dist = np.where(z >= src_threshold, np.int64(0), INF)
    h, w = z.shape
    pq = [(0, int(i)) for i in np.flatnonzero(dist.ravel() == 0)]
    heapq.heapify(pq)
    d = dist.ravel()
    c = cost.ravel()
    while pq:
        du, u = heapq.heappop(pq)
        if du > d[u]:
            continue
        r, col = divmod(u, w)
        for nr, nc in ((r - 1, col), (r + 1, col), (r, col - 1), (r, col + 1)):
            if 0 <= nr < h and 0 <= nc < w:
                v = nr * w + nc
                nd = du + c[v]
                if nd < d[v]:
                    d[v] = nd
                    heapq.heappush(pq, (nd, v))
    return dist


@register("cost_distance_tiles", None)  # pixel path; tests/test_costdist.py
def cost_distance_tiles(spark, sf_dir):
    """Exact global least-cost surface over the merged level-0 mosaic
    (sources: z >= 4800 bright peaks; traversal cost 1 + z>>8): per-tile
    reach counts and distance sums after cross-tile relaxation rounds.
    Rows-only; global-Dijkstra equality is pinned in
    tests/test_costdist.py."""
    from .hydrology import _merged_tiles

    return cost_distance(_merged_tiles(spark), src_threshold=4800)
