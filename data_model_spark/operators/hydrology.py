"""Hydrological terrain analysis over the tiled raster: D8 flow direction
and distributed flow accumulation.

Treats the uint16 tile mosaic as a DEM (like ``operators/terrain.py``) and
computes the two classic hydrology layers every raster stack pairs with
slope products:

* **D8 flow direction** (O'Callaghan & Mark, CVGIP 1984; ESRI encoding
  E=1, SE=2, S=4, ... NE=128): each pixel drains to the steepest-DROP
  neighbor, diagonal distance sqrt(2).  The steepest choice is decided
  with EXACT integer arithmetic — cardinal drop c beats diagonal drop d
  iff 2*c^2 > d^2 (both positive) — so no float ever enters the
  comparison and results are bit-identical everywhere.  Ties take the
  first direction in the fixed E,SE,S,SW,W,NW,N,NE scan.  Pixels with no
  strictly positive drop are pits (code 0).  Because flow is strictly
  downhill, the flow graph is acyclic by construction and any
  z-descending order is a valid topological order — the key fact both
  the per-tile kernel and the global test reference exploit.

* **Flow accumulation** (number of upstream cells draining through each
  pixel, ESRI semantics): the sequential algorithm is one topological
  pass; the distributed version follows the tile-wise decomposition of
  Barnes, "Parallel non-divergent flow accumulation for trillion cell
  digital elevation models" (C&G 2017): accumulate INSIDE each tile in
  one local pass, emit the flux crossing each tile border, then iterate
  rounds where only tiles receiving new inflow re-propagate (deltas ride
  the same topological pass).  Each round is one explode + one tile-key
  join + one ``mapInPandas``; ``localCheckpoint`` truncates lineage like
  ``operators/pagerank.py``.  Rounds are bounded by the maximum number
  of tile-border crossings along any flow path (strictly-downhill paths
  cannot revisit a tile at the same elevation, so this terminates).

Halo semantics: absent neighbors are zeros (the shared
``focal.halo_exchange`` contract), so border pixels see z=0 outside the
stored mosaic — flow runs off the edge, and zero-valued cells are inert
pits (a drop onto z=0 is the edge pixel's problem; from z=0 every drop
is <= 0).  ``tests/test_hydrology.py`` proves tile-for-tile equality
with the zero-padded global-mosaic reference for both layers.

Flux crossing into a tile position that holds no stored tile vanishes
(inner join) — exactly what the global reference computes on stored
tiles, since flux entering the zero region pits immediately and never
re-enters.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .focal import halo_exchange
from .tiling import TILE_PX

# ESRI D8: (dr, dc, code) in tie-break priority order; canvas rows run
# southward (row 0 = north edge, adjoins tile_y + 1 per focal.halo_exchange)
_ORDER = [
    (0, 1, 1),     # E
    (1, 1, 2),     # SE
    (1, 0, 4),     # S
    (1, -1, 8),    # SW
    (0, -1, 16),   # W
    (-1, -1, 32),  # NW
    (-1, 0, 64),   # N
    (-1, 1, 128),  # NE
]
_CODE_OFF = {code: (dr, dc) for dr, dc, code in _ORDER}


def d8_directions(P: np.ndarray) -> np.ndarray:
    """D8 codes for the interior of a 1-px-padded int canvas (vectorized,
    exact integer steepest-drop comparisons)."""
    P = P.astype(np.int64, copy=False)
    H, W = P.shape[0] - 2, P.shape[1] - 2
    C = P[1:-1, 1:-1]
    best_d = np.zeros((H, W), dtype=np.int64)
    best_diag = np.zeros((H, W), dtype=bool)
    dirs = np.zeros((H, W), dtype=np.uint8)
    for dr, dc, code in _ORDER:
        N = P[1 + dr : 1 + dr + H, 1 + dc : 1 + dc + W]
        d = C - N
        diag = dr != 0 and dc != 0
        if diag:
            cmp = np.where(best_diag, d > best_d, d * d > 2 * best_d * best_d)
        else:
            cmp = np.where(best_diag, 2 * d * d > best_d * best_d, d > best_d)
        take = (d > 0) & ((best_d <= 0) | cmp)
        best_d = np.where(take, d, best_d)
        best_diag = np.where(take, diag, best_diag)
        dirs = np.where(take, code, dirs).astype(np.uint8)
    return dirs


def _targets(dirs: np.ndarray):
    """Per-pixel flat target index; -1 = pit, -(2+slot) = leaves the tile.

    Returns (tgt int64 flat, borders list[(dty_tile, dtx_tile, entry_idx)])
    where tile deltas follow the mosaic convention: canvas row -1 is tile_y+1
    (north), canvas col 256 is tile_x+1 (east).
    """
    n = TILE_PX
    tgt = np.full(n * n, -1, dtype=np.int64)
    borders: list[tuple[int, int, int]] = []
    rr, cc = np.divmod(np.arange(n * n), n)
    d = dirs.ravel()
    for code, (dr, dc) in _CODE_OFF.items():
        m = d == code
        if not m.any():
            continue
        nr, nc = rr[m] + dr, cc[m] + dc
        inside = (nr >= 0) & (nr < n) & (nc >= 0) & (nc < n)
        idx = np.flatnonzero(m)
        tgt[idx[inside]] = nr[inside] * n + nc[inside]
        for i, r2, c2 in zip(idx[~inside], nr[~inside], nc[~inside]):
            dty = 1 if r2 < 0 else (-1 if r2 >= n else 0)
            dtx = 1 if c2 >= n else (-1 if c2 < 0 else 0)
            entry = (r2 % n) * n + (c2 % n)
            tgt[i] = -(2 + len(borders))
            borders.append((dty, dtx, entry))
    return tgt, borders


def _propagate(z, dirs, acc, pending):
    """One topological pass. ``pending=None`` = source-injection (init)
    round: every cell contributes 1 downstream.  Returns {slot: flux}."""
    n = TILE_PX
    # int64 before negation: -uint16 wraps mod 2^16 and corrupts the order
    order = np.argsort(-z.ravel().astype(np.int64), kind="stable")
    tgt, borders = _targets(dirs)
    out: dict[int, int] = {}
    accf = acc.ravel()
    if pending is None:
        for s in order.tolist():
            t = tgt[s]
            if t == -1:
                continue
            f = accf[s] + 1
            if t >= 0:
                accf[t] += f
            else:
                slot = -(t + 2)
                out[slot] = out.get(slot, 0) + f
    else:
        pend = pending.ravel()
        for s in order.tolist():
            p = pend[s]
            if p == 0:
                continue
            accf[s] += p
            t = tgt[s]
            if t == -1:
                continue
            if t >= 0:
                pend[t] += p
            else:
                slot = -(t + 2)
                out[slot] = out.get(slot, 0) + p
    # several cells can cross at the same (tile, entry) — e.g. a W and a SW
    # exit converging on one border pixel — so SUM per border key
    res: dict[tuple[int, int, int], int] = {}
    for slot, f in out.items():
        k = borders[slot]
        res[k] = res.get(k, 0) + f
    return res


_OUT_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("tx", T.LongType(), False),
            T.StructField("ty", T.LongType(), False),
            T.StructField("entry", T.IntegerType(), False),
            T.StructField("flux", T.LongType(), False),
        ]
    )
)

_STATE_FIELDS = [
    T.StructField("zdata", T.BinaryType(), False),
    T.StructField("dirs", T.BinaryType(), False),
    T.StructField("acc", T.BinaryType(), False),
    T.StructField("outflows", _OUT_T, False),
    T.StructField("n_pits", T.LongType(), False),
]


def flow_direction(tiles: DataFrame) -> DataFrame:
    """Per-tile D8 direction canvas (uint8 ``dirs``) + pit count; one halo
    shuffle, zero padding outside the mosaic."""

    def compute(P: np.ndarray, n_halo: int) -> dict:
        dirs = d8_directions(P)
        return {"dirs": dirs.tobytes(), "n_pits": int((dirs == 0).sum())}

    fields = [
        T.StructField("dirs", T.BinaryType(), False),
        T.StructField("n_pits", T.LongType(), False),
    ]
    return halo_exchange(tiles, 1, compute, fields)


def flow_accumulation(tiles: DataFrame, max_rounds: int = 64) -> DataFrame:
    """Per-tile flow-accumulation canvas (int64 ``acc``) with exact
    cross-tile flux: (var, level, tile_x, tile_y, n_halo, n_pits, acc,
    acc_sum, acc_max).
    """

    def compute(P: np.ndarray, n_halo: int) -> dict:
        z = P[1:-1, 1:-1].astype(np.uint16)
        dirs = d8_directions(P)
        acc = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
        emitted = _propagate(z, dirs, acc, None)
        return {
            "zdata": z.tobytes(),
            "dirs": dirs.tobytes(),
            "acc": acc.tobytes(),
            "outflows": [
                {"tx": dtx, "ty": dty, "entry": entry, "flux": flux}
                for (dty, dtx, entry), flux in sorted(emitted.items())
            ],
            "n_pits": int((dirs == 0).sum()),
        }

    state = halo_exchange(tiles, 1, compute, _STATE_FIELDS).localCheckpoint()
    keys = ["var", "level", "tile_x", "tile_y"]

    step_schema = T.StructType(
        [f for f in state.schema.fields if f.name != "inflows"]
    )

    def step(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                z = np.frombuffer(row.zdata, dtype=np.uint16).reshape(TILE_PX, TILE_PX)
                dirs = np.frombuffer(row.dirs, dtype=np.uint8).reshape(TILE_PX, TILE_PX)
                acc = np.frombuffer(row.acc, dtype=np.int64).reshape(TILE_PX, TILE_PX).copy()
                pending = np.zeros(TILE_PX * TILE_PX, dtype=np.int64)
                for infl in row.inflows:
                    pending[infl["entry"]] += infl["flux"]
                emitted = _propagate(z, dirs, acc, pending)
                recs.append(
                    {
                        "var": row.var,
                        "level": int(row.level),
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_halo": int(row.n_halo),
                        "zdata": row.zdata,
                        "dirs": row.dirs,
                        "acc": acc.tobytes(),
                        "outflows": [
                            {"tx": dtx, "ty": dty, "entry": e, "flux": f}
                            for (dty, dtx, e), f in sorted(emitted.items())
                        ],
                        "n_pits": int(row.n_pits),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in step_schema.fields}
            )

    for _ in range(max_rounds):
        pending_out = state.select(
            *keys, F.explode("outflows").alias("o")
        ).select(
            "var",
            "level",
            (F.col("tile_x") + F.col("o.tx")).alias("tile_x"),
            (F.col("tile_y") + F.col("o.ty")).alias("tile_y"),
            F.col("o.entry").alias("entry"),
            F.col("o.flux").alias("flux"),
        )
        inflows = pending_out.groupBy(*keys).agg(
            F.collect_list(F.struct("entry", "flux")).alias("inflows")
        )
        updated = (
            state.drop("outflows").join(inflows, keys).mapInPandas(step, step_schema)
        )
        untouched = state.join(inflows.select(*keys), keys, "left_anti").withColumn(
            "outflows", F.array().cast(_OUT_T)
        )
        state = updated.unionByName(untouched).localCheckpoint()
        n_out = state.agg(F.sum(F.size("outflows"))).collect()[0][0] or 0
        if n_out == 0:
            break
    else:
        raise RuntimeError(f"flow_accumulation did not converge in {max_rounds} rounds")

    def stats(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                acc = np.frombuffer(row.acc, dtype=np.int64)
                recs.append(
                    {
                        "var": row.var,
                        "level": int(row.level),
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_halo": int(row.n_halo),
                        "n_pits": int(row.n_pits),
                        "acc": row.acc,
                        "acc_sum": int(acc.sum()),
                        "acc_max": int(acc.max()),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema.fields}
            )

    out_schema = T.StructType(
        [
            T.StructField("var", T.StringType(), False),
            T.StructField("level", T.IntegerType(), False),
            T.StructField("tile_x", T.LongType(), False),
            T.StructField("tile_y", T.LongType(), False),
            T.StructField("n_halo", T.IntegerType(), False),
            T.StructField("n_pits", T.LongType(), False),
            T.StructField("acc", T.BinaryType(), False),
            T.StructField("acc_sum", T.LongType(), False),
            T.StructField("acc_max", T.LongType(), False),
        ]
    )
    return state.mapInPandas(stats, out_schema)


def reference_accumulation(Z: np.ndarray):
    """Sequential global truth on a zero-padded mosaic: (dirs, acc)."""
    H, W = Z.shape
    dirs = d8_directions(np.pad(Z.astype(np.int64), 1))
    order = np.argsort(-Z.ravel().astype(np.int64), kind="stable")
    acc = np.zeros(H * W, dtype=np.int64)
    d = dirs.ravel()
    for idx in order.tolist():
        code = d[idx]
        if code == 0:
            continue
        dr, dc = _CODE_OFF[code]
        r, c = divmod(idx, W)
        nr, nc = r + dr, c + dc
        if 0 <= nr < H and 0 <= nc < W:
            acc[nr * W + nc] += acc[idx] + 1
    return dirs, acc.reshape(H, W)


# ---------------------------------------------------------------------------
# registered queries (pixel path -> rows-only; exactness in tests)
# ---------------------------------------------------------------------------


def _merged_tiles(spark):
    from ..sources.images import generate_images_df
    from . import tiling

    images = generate_images_df(spark, 24)
    return tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter(F.col("level") == 0)


from .registry import register  # noqa: E402


@register("flow_dir_tiles", None)  # pixel path; exactness in tests/test_hydrology.py
def flow_dir_tiles(spark, sf_dir):
    """D8 flow directions over the merged level-0 mosaic: per-tile pit
    counts + direction-code sum (integer fingerprint of the canvas)."""
    out = flow_direction(_merged_tiles(spark))

    def fp(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["dir_sum"] = [
                int(np.frombuffer(b, dtype=np.uint8).sum()) for b in pdf["dirs"]
            ]
            yield pdf[["var", "tile_x", "tile_y", "n_halo", "n_pits", "dir_sum"]]

    schema = (
        "var string, tile_x long, tile_y long, n_halo int, n_pits long, dir_sum long"
    )
    return out.mapInPandas(fp, schema)


@register("flow_accum_tiles", None)  # pixel path; exactness in tests/test_hydrology.py
def flow_accum_tiles(spark, sf_dir):
    """Distributed D8 flow accumulation over the merged level-0 mosaic:
    per-tile accumulation totals after cross-tile flux convergence."""
    out = flow_accumulation(_merged_tiles(spark))
    return out.select(
        "var", "tile_x", "tile_y", "n_halo", "n_pits", "acc_sum", "acc_max"
    )
