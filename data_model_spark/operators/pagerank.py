"""Fixed-point PageRank over the customer-supplier trade graph.

Reference parity: the reference has no graph analytics (its data model is
raster/metadata trees); like ``operators/components.py`` this is part of
the web-scale pipeline surface the engine adds (link-graph quality
signals for crawl curation — PageRank is the canonical one, Page et al.
1999).

Determinism contract: floating-point PageRank sums millions of doubles
whose order depends on partitioning, so two runs (or two engines) differ
in the last bits.  This implementation therefore defines the semantics in
**64-bit integer fixed-point micro-units**:

* ranks start at ``SCALE // n`` (SCALE = 10^12);
* each iteration: ``contrib(u->v) = rank(u) DIV out_degree(u)`` (integer
  division), ``rank'(v) = (15 * SCALE DIV n) DIV 100 + (85 * sum(contrib))
  DIV 100``.

Every operation is exact integer arithmetic — sums commute, so the result
is bit-identical at any parallelism, and the DuckDB oracle replays the
same iterations in SQL (``//``) with hash-level equality.  Max magnitude:
``85 * SCALE < 2^63``.  The deliberate deviation from textbook PageRank
(truncation instead of float division, no dangling redistribution —
the registered graph is symmetric, so no dangling nodes exist) is the
price of a plan-independent answer; at ``SCALE = 10^12`` the truncation
error after k iterations is < k * deg nano-units per rank.

Scale shape: per iteration one broadcast-or-shuffle equi-join of edges
against ranks (edges >> ranks, join keyed on src) and one ``groupBy(dst)``
partial-aggregated sum — the same two-shuffle round as large-star; ranks
``localCheckpoint`` per round to truncate lineage.  Iterations are a fixed
small constant (convergence tolerance is meaningless in fixed-point).
"""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

SCALE = 10**12

#: edge-count ceiling for the single-task fixed-point fast path.  Size-based
#: (not core-count-based), same dial family as ``components.CC_SMALL_EDGES``:
#: below it the per-iteration join+aggregate shuffles are pure scheduling
#: overhead; above it the distributed rounds run unchanged.
PR_SMALL_EDGES = int(_os.environ.get("DMS_PR_SMALL_EDGES", str(1 << 21)))


def _pagerank_single_task(
    e: DataFrame, iterations: int, damping_pct: int
) -> DataFrame:
    """One-task replay of the fixed-point rounds — bit-identical by
    construction (every operation is exact int64: floor division, sums
    commute), executor-side via coalesced mapInPandas, never the driver."""
    import numpy as np
    import pandas as pd

    def kernel(batches):
        srcs, dsts = [], []
        for pdf in batches:
            srcs.append(pdf["src"].to_numpy(dtype=np.int64, copy=False))
            dsts.append(pdf["dst"].to_numpy(dtype=np.int64, copy=False))
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        nodes = np.unique(np.concatenate([src, dst]))
        n = len(nodes)
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        deg = np.zeros(n, dtype=np.int64)
        np.add.at(deg, si, 1)
        base = (SCALE // n) * (100 - damping_pct) // 100
        rank = np.full(n, SCALE // n, dtype=np.int64)
        for _ in range(iterations):
            contrib = rank[si] // deg[si]  # rank DIV out_degree, exact
            s = np.zeros(n, dtype=np.int64)
            np.add.at(s, di, contrib)
            rank = base + damping_pct * s // 100  # (85*s) DIV 100, exact
        yield pd.DataFrame({"node": nodes, "rank": rank})

    return e.coalesce(1).mapInPandas(kernel, "node long, rank long")


def pagerank_fixedpoint(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` fixed-point PageRank rounds.

    ``edges`` is a directed edge list; every node must have out-degree
    >= 1 (callers with dangling nodes should symmetrize first — the
    registered query does).  ``rank`` is in SCALE-units (sums to ~SCALE
    minus truncation dust).
    """
    # materialize the (possibly expensive) edge derivation ONCE: it feeds
    # nodes, deg and the per-iteration join — uncheckpointed it would
    # re-execute for each consumer (~2 + iterations times)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)

    from . import components as _cmp

    n_edges = e.count()
    if n_edges == 0:
        raise ValueError("pagerank over an empty edge set")
    if _cmp.ROUND_HOOK is None and n_edges <= PR_SMALL_EDGES:
        return _pagerank_single_task(e, iterations, damping_pct)

    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)  # re-read every iteration for the base term
    )
    n = nodes.count()
    if n == 0:
        raise ValueError("pagerank over an empty edge set")
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edges carry their out-degree once; ranks re-join per iteration
    ed = e.join(deg, "src").localCheckpoint(eager=False)

    base = (SCALE // n) * (100 - damping_pct) // 100
    ranks = nodes.select("node", F.lit(SCALE // n).alias("rank"))
    import time as _time

    for _round in range(iterations):
        _t0 = _time.perf_counter()
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", F.expr("rank DIV deg").alias("c"))
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"{damping_pct} * coalesce(s, 0L) DIV 100")
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        if _cmp.ROUND_HOOK is not None:  # scaling-bench instrumentation
            n_r = ranks.count()  # forces the round; lazy otherwise
            _cmp.ROUND_HOOK("pr", _round, _time.perf_counter() - _t0, n_r)
    return ranks


# ---------------------------------------------------------------------------
# registered query: symmetrized customer<->supplier trade graph
# ---------------------------------------------------------------------------

_EDGES_CTE = """
trade AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
edges AS (
  SELECT cust AS src, supp + 1000000 AS dst FROM trade
  UNION ALL
  SELECT supp + 1000000, cust FROM trade)"""


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    trade = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + 1000000).alias("supp"),
        )
        .distinct()
        # both symmetrized union branches read this plan; uncheckpointed,
        # the join+distinct would execute once per branch (lazy: the first
        # action materializes, the second branch reuses the same RDD)
        .localCheckpoint(eager=False)
    )
    return trade.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).union(
        trade.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )


def _pagerank_oracle(iterations: int = 3) -> str:
    """Unrolled fixed-point iterations — same integer ops as the engine."""
    parts = [
        f"WITH {_EDGES_CTE[1:]},",
        """nodes AS (SELECT DISTINCT src AS node FROM edges
            UNION SELECT DISTINCT dst FROM edges),
n AS (SELECT COUNT(*) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
r0 AS (SELECT node, CAST(1000000000000 // (SELECT n FROM n) AS BIGINT) AS rank
       FROM nodes)""",
    ]
    for i in range(iterations):
        parts.append(f""",
s{i} AS (
  SELECT e.dst AS node, SUM(r.rank // d.deg) AS s
  FROM edges e JOIN deg d ON d.src = e.src JOIN r{i} r ON r.node = e.src
  GROUP BY e.dst),
r{i + 1} AS (
  SELECT nd.node,
         CAST((1000000000000 // (SELECT n FROM n)) * 15 // 100
              + 85 * COALESCE(s.s, 0) // 100 AS BIGINT) AS rank
  FROM nodes nd LEFT JOIN s{i} s ON s.node = nd.node)""")
    parts.append(f"\nSELECT node, rank FROM r{iterations}")
    return "".join(parts)


@register("pagerank_trade", _pagerank_oracle(3))
def pagerank_trade(spark, sf_dir):
    """3-iteration fixed-point PageRank over the symmetrized
    customer<->supplier graph (suppliers offset by 10^6 to disambiguate);
    bit-exact vs the SQL-unrolled oracle."""
    return pagerank_fixedpoint(_trade_edges(spark, sf_dir), iterations=3)
