"""Label-propagation communities (synchronous LPA, bounded rounds).

Community detection over the sparsified trade graph — the near-linear
complement to the exact structural suites already in the engine
(connected components, k-core, triangles, PageRank).  Raghavan et al.
(2007) with the determinism the async original lacks:

* synchronous rounds: round r+1 labels derive ONLY from round r labels;
* deterministic vote: a node adopts the neighbor label with the highest
  count, ties broken by SMALLEST label — argmax via one per-node
  row_number window whose ``rk = 1`` filter compiles to
  WindowGroupLimit (per-partition top-1 heaps, no full sort);
* fixed round count R (the production form — each round is one
  neighbor-label join + one count aggregation + the top-1 window, all
  hash-keyed on node; lineage is truncated per round with
  localCheckpoint like the engine's other iterative operators).

The oracle unrolls the SAME R rounds in SQL (the k-core pattern), so the
driver hash-match pins every round's votes, not just the final labels.
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .kcore import _SPARSE_EDGES_CTE, _sparse_trade_edges
from .registry import register

_ROUNDS = 3

#: edge-count ceiling for the single-task round replay (size-based dial,
#: same family as ``components.CC_SMALL_EDGES``): below it the per-round
#: join + count + window shuffles are pure scheduling overhead.
LPA_SMALL_EDGES = int(_os.environ.get("DMS_LPA_SMALL_EDGES", str(1 << 21)))


def _lpa_single_task(edges: DataFrame, rounds: int) -> DataFrame:
    """One-task replay of the synchronous rounds — integer counts, argmax
    with ties to the smallest label, exactly the window's
    (c DESC, lbl) order; executor-side via coalesced mapInPandas."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        srcs, dsts = [], []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy(dtype=np.int64, copy=False))
            dsts.append(pdf["dst"].to_numpy(dtype=np.int64, copy=False))
        if not srcs:
            yield pd.DataFrame(
                {"node": pd.Series(dtype="int64"),
                 "community": pd.Series(dtype="int64")}
            )
            return
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        uni = np.unique(np.concatenate([src, dst]))
        si = np.searchsorted(uni, src)
        di = np.searchsorted(uni, dst)
        n = len(uni)
        # labels init: node id for every distinct src; non-src dsts unlabeled
        lbl = uni.copy()
        labeled = np.zeros(n, dtype=bool)
        labeled[np.unique(si)] = True
        for _ in range(rounds):
            m = labeled[di]  # inner join: only labeled dst votes
            vs, vl = si[m], lbl[di[m]]
            order = np.lexsort((vl, vs))
            vs, vl = vs[order], vl[order]
            grp = np.empty(len(vs), dtype=bool)
            if len(vs):
                grp[0] = True
                grp[1:] = (vs[1:] != vs[:-1]) | (vl[1:] != vl[:-1])
            starts = np.flatnonzero(grp)
            counts = np.diff(np.append(starts, len(vs)))
            g_src, g_lbl = vs[starts], vl[starts]
            # per src: max count, ties -> smallest label
            sel = np.lexsort((g_lbl, -counts, g_src))
            s_src = g_src[sel]
            first = np.empty(len(sel), dtype=bool)
            if len(sel):
                first[0] = True
                first[1:] = s_src[1:] != s_src[:-1]
            win_src = s_src[first]
            win_lbl = g_lbl[sel][first]
            lbl2 = uni.copy()
            lab2 = np.zeros(n, dtype=bool)
            lbl2[win_src] = win_lbl
            lab2[win_src] = True
            lbl, labeled = lbl2, lab2
        keep = np.flatnonzero(labeled)
        yield pd.DataFrame({"node": uni[keep], "community": lbl[keep]})

    return edges.coalesce(1).mapInPandas(kernel, "node long, community long")


def lpa_communities(edges: DataFrame, rounds: int = _ROUNDS) -> DataFrame:
    """(node, community) after ``rounds`` synchronous LPA rounds; labels
    initialize to the node id."""
    from . import components as _cmp

    if _cmp.ROUND_HOOK is None:
        e = edges.select("src", "dst").localCheckpoint(eager=True)
        if e.count() <= LPA_SMALL_EDGES:
            return _lpa_single_task(e, rounds)
        edges = e

    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "lbl", F.col("node")
    )
    for _ in range(rounds):
        votes = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(F.col("src").alias("n"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("n").orderBy(F.col("c").desc(), "lbl")
        labels = (
            votes.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("n").alias("node"), "lbl")
            .localCheckpoint(eager=False)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def _lpa_oracle(rounds: int) -> str:
    parts = [f"WITH {_SPARSE_EDGES_CTE[1:]},"]
    parts.append("l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e0)")
    for i in range(rounds):
        parts.append(f""",
v{i} AS (
  SELECT e.src AS node, l.lbl, COUNT(*) AS c
  FROM e0 e JOIN l{i} l ON l.node = e.dst GROUP BY 1, 2),
l{i + 1} AS (
  SELECT node, lbl FROM (
    SELECT node, lbl,
           ROW_NUMBER() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
    FROM v{i}) WHERE rk = 1)""")
    parts.append(f"\nSELECT node, lbl AS community FROM l{rounds}")
    return "".join(parts)


@register("lpa_communities", _lpa_oracle(_ROUNDS))
def lpa_communities_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round synchronous LPA over the sparsified trade graph,
    bit-exact vs the SQL-unrolled rounds."""
    return lpa_communities(_sparse_trade_edges(spark, sf_dir))
