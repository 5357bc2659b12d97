"""Watershed basin labeling over the tile mosaic (hierarchical D8 closure).

Completes the hydrology suite (``flow_dir_tiles`` / ``flow_accum_tiles``):
every pixel is labeled with the basin it drains to — the pit (D8 code 0)
its unique flow path terminates at, or the point where the path leaves
the stored mosaic ("outlet").  ``d8_directions`` flows only to STRICTLY
lower neighbors (`hydrology.py:72`), so paths are cycle-free by height
monotonicity and pointer doubling is safe everywhere.

Distributed shape — the classic hierarchical-watershed decomposition
(local contraction + boundary graph), the same contraction idea as the
CCL module but on a directed forest:

1. **Within-tile compression** (one ``halo_exchange`` shuffle, edge
   strips only): the kernel pointer-doubles the per-tile flat target
   array (17 gather rounds cover any 65536-px path), so each pixel
   resolves to an in-tile pit or to its FIRST exit pixel (the D8 entry
   cell in a neighbor tile — always in that tile's 1-px border ring).
   It emits only aggregates: per-tile local-pit sums, per-exit-class
   pixel counts (<= 1020 classes/tile), and the tile's boundary map
   (terminal of each border-ring pixel, <= 1020 rows/tile).  The 65536
   per-pixel labels never shuffle.
2. **Boundary closure**: the boundary maps form a tiny functional graph
   (~1k rows/tile).  Each round composes the map with itself (pending
   rows join the full map on their target key), DOUBLING the resolved
   path depth — O(log chain-length) rounds, ``localCheckpoint`` per
   round for lineage truncation (the ``components.py`` discipline).
   Exits whose target tile is not stored resolve to "outlet" at the
   target coordinates.
3. **Assembly**: exit-class counts join the closed boundary map (one
   shuffle) and fold into the per-tile integer fingerprint
   ``sum(131*gr + 17*gc + 7919*is_out)`` over every pixel's basin
   label, where (gr, gc) are global pixel coordinates
   (``gr = -tile_y*256 + row``, ``gc = tile_x*256 + col``).

All arithmetic is int64-exact, so the driver-visible oracle is a pure
NumPy replay on the global mosaic: one absorbing next-pointer array over
the padded bounding rectangle, pointer-doubled to fixpoint, aggregated
per stored tile — no engine code in the loop (the ``mosaic_fp``
pattern).  Labels are path-order-invariant (the D8 path is unique), so
the per-tile sums match regardless of how the distributed plan
interleaves the chain.

Scale: per-round closure cost is bounded by total border pixels
(4*256 per tile — 1/64th of the pixel data), round count is
O(log max-chain); at a 10^6-tile mosaic that is a ~4e9-row join table,
hash-partitioned on (var, gr, gc) — heavy but linear, and never
materializes per-pixel labels across tiles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .focal import halo_exchange
from .tiling import TILE_PX
from .hydrology import _CODE_OFF, _targets, d8_directions
from .registry import register

_OUT_CONST = 7919  # fingerprint term marking outlet labels
_MOSAIC_N = 24  # same fixture as flow_dir_tiles / flow_accum_tiles


# ---------------------------------------------------------------------------
# stage 1: within-tile compression kernel
# ---------------------------------------------------------------------------


def _compress(dirs: np.ndarray):
    """(term, ttgt, borders): per-pixel flat terminal after pointer
    doubling; ttgt = tgt[term] (-1 pit, <=-2 exit slot)."""
    tgt, borders = _targets(dirs)
    idx = np.arange(TILE_PX * TILE_PX, dtype=np.int64)
    nxt = np.where(tgt >= 0, tgt, idx)
    for _ in range(17):  # 2^17 > 256*256: covers any in-tile path
        nxt = nxt[nxt]
    return nxt, tgt[nxt], borders


_EXIT_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("dty", T.IntegerType(), False),
            T.StructField("dtx", T.IntegerType(), False),
            T.StructField("tr", T.IntegerType(), False),
            T.StructField("tc", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
        ]
    )
)
_BMAP_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("br", T.IntegerType(), False),
            T.StructField("bc", T.IntegerType(), False),
            T.StructField("pit", T.BooleanType(), False),
            T.StructField("dty", T.IntegerType(), False),
            T.StructField("dtx", T.IntegerType(), False),
            T.StructField("tr", T.IntegerType(), False),
            T.StructField("tc", T.IntegerType(), False),
        ]
    )
)
_STAGE1_FIELDS = [
    T.StructField("n_pits", T.LongType(), False),
    T.StructField("n_pix_local", T.LongType(), False),
    T.StructField("sum_pr", T.LongType(), False),
    T.StructField("sum_pc", T.LongType(), False),
    T.StructField("exits", _EXIT_T, False),
    T.StructField("bmap", _BMAP_T, False),
]


def _stage1_compute(P: np.ndarray, n_halo: int) -> dict:
    n = TILE_PX
    dirs = d8_directions(P)
    term, ttgt, borders = _compress(dirs)
    local = ttgt == -1
    pr, pc = np.divmod(term[local], n)

    # exit classes: pixels per border slot
    slot = -(ttgt[~local] + 2)
    uslot, cnt = np.unique(slot, return_counts=True)
    exits = [
        {
            "dty": int(borders[s][0]),
            "dtx": int(borders[s][1]),
            "tr": int(borders[s][2] // n),
            "tc": int(borders[s][2] % n),
            "n": int(c),
        }
        for s, c in zip(uslot.tolist(), cnt.tolist())
    ]

    # boundary map: terminal of every border-ring pixel
    ring = np.concatenate(
        [
            np.arange(n),  # row 0
            np.arange((n - 1) * n, n * n),  # row 255
            np.arange(1, n - 1) * n,  # col 0
            np.arange(1, n - 1) * n + (n - 1),  # col 255
        ]
    )
    bt, btt = term[ring], ttgt[ring]
    bmap = []
    for b, t, tt in zip(ring.tolist(), bt.tolist(), btt.tolist()):
        if tt == -1:
            bmap.append(
                {"br": b // n, "bc": b % n, "pit": True,
                 "dty": 0, "dtx": 0, "tr": t // n, "tc": t % n}
            )
        else:
            dty, dtx, entry = borders[-(tt + 2)]
            bmap.append(
                {"br": b // n, "bc": b % n, "pit": False,
                 "dty": int(dty), "dtx": int(dtx),
                 "tr": int(entry // n), "tc": int(entry % n)}
            )
    return {
        "n_pits": int((dirs == 0).sum()),
        "n_pix_local": int(local.sum()),
        "sum_pr": int(pr.sum()),
        "sum_pc": int(pc.sum()),
        "exits": exits,
        "bmap": bmap,
    }


# ---------------------------------------------------------------------------
# stage 2: boundary closure + assembly
# ---------------------------------------------------------------------------


def _gr(ty, r):
    return -ty * TILE_PX + r


def _gc(tx, c):
    return tx * TILE_PX + c


import os as _os  # noqa: E402

#: boundary-map row ceiling for the single-task closure (size-based dial,
#: ``components.CC_SMALL_EDGES`` family).  The map holds <= 4*TILE_PX
#: rows per stored tile, so below this the per-round count + self-join +
#: checkpoint of the doubling loop is pure scheduling overhead.
_BASIN_SMALL_BMAP = int(_os.environ.get("DMS_BASIN_SMALL_BMAP", str(1 << 20)))


def _closure_single_task(b: DataFrame) -> DataFrame:
    """Close the tiny functional boundary graph in ONE task: follow each
    pending row's target chain to its pit (kind 1, pit coords) or first
    non-stored target (outlet, kind 2, those coords) — the exact fixpoint
    the doubling rounds converge to (D8 paths are acyclic by height
    monotonicity, so the walk terminates).  Executor-side via coalesced
    mapInPandas, memoized with path compression."""
    import pandas as pd

    def kernel(batches):
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            yield pd.DataFrame(
                {
                    "var": pd.Series(dtype="object"),
                    "gr": pd.Series(dtype="int64"),
                    "gc": pd.Series(dtype="int64"),
                    "kind": pd.Series(dtype="int32"),
                    "tgr": pd.Series(dtype="int64"),
                    "tgc": pd.Series(dtype="int64"),
                }
            )
            return
        pdf = pd.concat(frames, ignore_index=True)
        m = {
            (v, int(r), int(c)): (int(k), int(tr), int(tc))
            for v, r, c, k, tr, tc in zip(
                pdf["var"], pdf["gr"], pdf["gc"],
                pdf["kind"], pdf["tgr"], pdf["tgc"],
            )
        }
        memo: dict = {}

        def term(var, r, c):
            stack, key = [], (var, r, c)
            while True:
                if key in memo:
                    res = memo[key]
                    break
                row = m.get(key)
                if row is None:  # target tile not stored -> outlet there
                    res = (2, key[1], key[2])
                    break
                k, tr, tc = row
                if k != 0:  # pit-final row: adopt its label
                    res = (k, tr, tc)
                    break
                stack.append(key)
                key = (var, tr, tc)
            for s in stack:
                memo[s] = res
            return res

        kinds = pdf["kind"].to_numpy().copy()
        tgrs = pdf["tgr"].to_numpy().copy()
        tgcs = pdf["tgc"].to_numpy().copy()
        for i in range(len(pdf)):
            if kinds[i] == 0:
                k, tr, tc = term(pdf["var"].iat[i], int(tgrs[i]), int(tgcs[i]))
                kinds[i], tgrs[i], tgcs[i] = k, tr, tc
        out = pdf.copy()
        out["kind"], out["tgr"], out["tgc"] = kinds, tgrs, tgcs
        yield out

    return b.coalesce(1).mapInPandas(
        kernel, "var string, gr long, gc long, kind int, tgr long, tgc long"
    )


def basin_tiles(tiles: DataFrame, max_rounds: int = 14) -> DataFrame:
    """(var, tile_x, tile_y, n_pits, n_pix_out, basin_fp) per level-0
    tile: local D8 pit count, pixels draining off the stored mosaic, and
    the exact int64 fingerprint of every pixel's basin label."""
    st = halo_exchange(tiles, 1, _stage1_compute, _STAGE1_FIELDS)
    st = st.localCheckpoint()
    keys = ["var", "tile_x", "tile_y"]
    ty, tx = F.col("tile_y"), F.col("tile_x")

    # per-tile local-part fingerprint (affine decomposition of the sums)
    local = st.select(
        *keys,
        "n_pits",
        "n_pix_local",
        (
            131 * (F.col("sum_pr") - ty * TILE_PX * F.col("n_pix_local"))
            + 17 * (F.col("sum_pc") + tx * TILE_PX * F.col("n_pix_local"))
        ).alias("fp_local"),
    )

    ex = st.select(*keys, F.explode("exits").alias("e")).select(
        *keys,
        _gr(ty + F.col("e.dty"), F.col("e.tr")).alias("egr"),
        _gc(tx + F.col("e.dtx"), F.col("e.tc")).alias("egc"),
        F.col("e.n").alias("n"),
    )

    # boundary map rows: kind 1 = pit-final, 0 = exit-pending
    b = st.select(*keys, F.explode("bmap").alias("m")).select(
        "var",
        _gr(ty, F.col("m.br")).alias("gr"),
        _gc(tx, F.col("m.bc")).alias("gc"),
        F.when(F.col("m.pit"), F.lit(1)).otherwise(F.lit(0)).alias("kind"),
        _gr(ty + F.col("m.dty"), F.col("m.tr")).alias("tgr"),
        _gc(tx + F.col("m.dtx"), F.col("m.tc")).alias("tgc"),
    ).localCheckpoint()

    if _BASIN_SMALL_BMAP > 0:
        n_bmap = b.count()
        if n_bmap <= _BASIN_SMALL_BMAP:
            b = _closure_single_task(b)
            return _assemble(local, ex, b, keys)

    for _ in range(max_rounds):
        if b.filter(F.col("kind") == 0).limit(1).count() == 0:
            break
        m = b.select(
            F.col("var").alias("mvar"),
            F.col("gr").alias("mgr"),
            F.col("gc").alias("mgc"),
            F.col("kind").alias("mkind"),
            F.col("tgr").alias("mtgr"),
            F.col("tgc").alias("mtgc"),
        )
        pend = b.filter(F.col("kind") == 0)
        resolved = (
            pend.join(
                m,
                (pend.var == m.mvar)
                & (pend.tgr == m.mgr)
                & (pend.tgc == m.mgc),
                "left",
            )
            .select(
                "var", "gr", "gc",
                # no row for the target tile -> outlet (kind 2), keep coords
                F.when(F.col("mkind").isNull(), F.lit(2))
                .otherwise(F.col("mkind"))
                .alias("kind"),
                F.coalesce("mtgr", "tgr").alias("tgr"),
                F.coalesce("mtgc", "tgc").alias("tgc"),
            )
        )
        b = b.filter(F.col("kind") != 0).unionByName(resolved).localCheckpoint()
    else:  # pragma: no cover — 2^14 border hops exceeds any real mosaic
        raise RuntimeError("boundary closure did not converge")

    return _assemble(local, ex, b, keys)


def _assemble(local: DataFrame, ex: DataFrame, b: DataFrame, keys) -> DataFrame:
    # assembly: exit classes -> closed labels -> per-tile fingerprint
    lbl = b.select(
        F.col("var").alias("mvar"),
        F.col("gr").alias("mgr"),
        F.col("gc").alias("mgc"),
        "kind", "tgr", "tgc",
    )
    exf = (
        ex.join(
            lbl,
            (ex.var == lbl.mvar) & (ex.egr == lbl.mgr) & (ex.egc == lbl.mgc),
            "left",
        )
        .select(
            *keys,
            "n",
            # exit into a non-stored tile: no boundary row -> outlet there
            F.coalesce("kind", F.lit(2)).alias("kind"),
            F.coalesce("tgr", "egr").alias("tgr"),
            F.coalesce("tgc", "egc").alias("tgc"),
        )
        .groupBy(*keys)
        .agg(
            F.sum(F.when(F.col("kind") == 2, F.col("n")).otherwise(0)).alias(
                "n_pix_out"
            ),
            F.sum(
                F.col("n")
                * (
                    131 * F.col("tgr")
                    + 17 * F.col("tgc")
                    + F.when(F.col("kind") == 2, F.lit(_OUT_CONST)).otherwise(0)
                )
            ).alias("fp_exit"),
        )
    )

    return (
        local.join(exf, keys, "left")
        .select(
            *keys,
            "n_pits",
            F.coalesce("n_pix_out", F.lit(0)).alias("n_pix_out"),
            (F.col("fp_local") + F.coalesce("fp_exit", F.lit(0))).alias(
                "basin_fp"
            ),
        )
    )


# ---------------------------------------------------------------------------
# global NumPy replay (oracle)
# ---------------------------------------------------------------------------


def reference_basins(n_images: int = _MOSAIC_N):
    """Per-tile (var, tile_x, tile_y, n_pits, n_pix_out, basin_fp) from a
    single global absorbing-pointer pass over each var's mosaic."""
    from . import replay

    cv = replay.merged_canvases(n_images)
    n = TILE_PX
    rows = []
    for var in replay.mosaic_vars(cv):
        G, tiles, (tx_min, ty_max) = replay.var_mosaic(cv, var)
        H, W = G.shape
        stored = np.zeros((H, W), bool)
        for tx, tyy in tiles:
            r0, c0 = (ty_max - tyy) * n, (tx - tx_min) * n
            stored[r0 : r0 + n, c0 : c0 + n] = True
        P = np.zeros((H + 2, W + 2), np.int64)
        P[1:-1, 1:-1] = G
        dirs = d8_directions(P)
        Hp, Wp = H + 2, W + 2
        nxt = np.arange(Hp * Wp, dtype=np.int64)
        Rp, Cp = np.divmod(nxt, Wp)
        interior = (
            (Rp >= 1) & (Rp <= H) & (Cp >= 1) & (Cp <= W)
        ) & np.pad(stored, 1).ravel()
        dflat = np.zeros(Hp * Wp, np.uint8)
        dflat[interior] = dirs.ravel()[
            (Rp[interior] - 1) * W + (Cp[interior] - 1)
        ]
        for code, (dr, dc) in _CODE_OFF.items():
            m = interior & (dflat == code)
            nxt[m] = (Rp[m] + dr) * Wp + (Cp[m] + dc)
        steps = int(np.ceil(np.log2(Hp * Wp))) + 1
        for _ in range(steps):
            nxt = nxt[nxt]
        tr, tc = np.divmod(nxt, Wp)
        is_out = ~np.pad(stored, 1).ravel()[nxt]
        ggr = (tr - 1 - ty_max * n).reshape(Hp, Wp)
        ggc = (tc - 1 + tx_min * n).reshape(Hp, Wp)
        is_out = is_out.reshape(Hp, Wp)
        for tx, tyy in sorted(tiles):
            r0, c0 = (ty_max - tyy) * n + 1, (tx - tx_min) * n + 1
            sl = np.s_[r0 : r0 + n, c0 : c0 + n]
            fp = (
                131 * ggr[sl].astype(np.int64)
                + 17 * ggc[sl]
                + _OUT_CONST * is_out[sl]
            ).sum()
            rows.append(
                (
                    var,
                    tx,
                    tyy,
                    int((dirs[r0 - 1 : r0 - 1 + n, c0 - 1 : c0 - 1 + n] == 0).sum()),
                    int(is_out[sl].sum()),
                    int(fp),
                )
            )
    return rows


def _basin_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_pits", "BIGINT"),
            ("n_pix_out", "BIGINT"),
            ("basin_fp", "BIGINT"),
        ],
        reference_basins(),
    )


@register("basin_labels_fp", _basin_oracle)
def basin_labels_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watershed basin labels over the 24-scene merged mosaic: per-tile
    pit counts, off-mosaic drainage, and the exact basin-label
    fingerprint — hash-checked against the global-mosaic pointer replay."""
    from .hydrology import _merged_tiles

    return basin_tiles(_merged_tiles(spark))
