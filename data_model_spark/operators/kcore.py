"""Bounded-round k-core peeling (Seidman 1983 degeneracy cores).

The link-graph robustness filter: iteratively delete nodes of degree
< k; what survives is the k-core — the standard "dense, well-connected
neighborhood" signal for crawl/link curation (and the first step of
degeneracy ordering).  Like ``sssp_khop`` the registered semantics are
**exact by definition**: R peel ROUNDS (each removes every node whose
CURRENT degree is < k, simultaneously) rather than convergence
detection, so the answer is plan-independent; with R >= the cascade
depth it equals the true k-core (pytest pins a crafted chain whose
cascade runs many rounds, plus fixpoint equality with a sequential
peeler).

Determinism contract: degrees are exact counts and the keep predicate
is an integer comparison — the surviving edge set after any round is a
pure function of the input, bit-identical at any parallelism, and the
DuckDB oracle replays identical unrolled rounds.

Scale shape: per round one map-side-combinable ``groupBy(src).count``
over the surviving edges and two semi-joins (src-keyed, dst-keyed)
against the node-sized keep set — the keep set broadcasts while small;
``localCheckpoint`` truncates lineage per round.  R is a fixed small
constant; edges only shrink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def kcore_peel(
    edges: DataFrame, k: int, rounds: int, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, deg): nodes surviving ``rounds`` simultaneous k-core peel
    rounds over a SYMMETRIC edge list, with their residual degree."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    for _ in range(rounds):
        e = _peel_round(e, k).localCheckpoint()
    return e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))


def _peel_round(e: DataFrame, k: int) -> DataFrame:
    """One simultaneous peel round (exposed so the plan gate can assert
    the combinable degree count and semi-joins pre-checkpoint)."""
    keep = (
        e.groupBy("src").agg(F.count("*").alias("deg"))
        .filter(F.col("deg") >= k)
        .select(F.col("src").alias("node"))
    )
    return e.join(keep, e["src"] == keep["node"], "left_semi").join(
        keep, e["dst"] == keep["node"], "left_semi"
    )


def kcore_reference(edges: list[tuple], k: int) -> dict:
    """Sequential fixpoint truth: {node: residual degree} of the k-core."""
    from collections import Counter

    es = set(edges)
    while True:
        deg = Counter(s for s, _ in es)
        kill = {n for n, d in deg.items() if d < k}
        if not kill:
            return dict(deg)
        es = {(s, d) for s, d in es if s not in kill and d not in kill}


_ROUNDS = 4

_SPARSE_EDGES_CTE = """
trade AS (
  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey AS supp
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE (o.o_custkey * 7 + l.l_suppkey * 13) % 10 < 3),
e0 AS (
  SELECT cust AS src, supp + 1000000 AS dst FROM trade
  UNION ALL SELECT supp + 1000000, cust FROM trade)"""


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = [f"WITH {_SPARSE_EDGES_CTE[1:]}"]
    for i in range(rounds):
        parts.append(f""",
d{i} AS (SELECT src AS node, COUNT(*) AS deg FROM e{i} GROUP BY 1),
k{i} AS (SELECT node FROM d{i} WHERE deg >= {k}),
e{i + 1} AS (SELECT e.src, e.dst FROM e{i} e
           JOIN k{i} a ON a.node = e.src JOIN k{i} b ON b.node = e.dst)""")
    parts.append(f"""
SELECT src AS node, COUNT(*) AS deg FROM e{rounds} GROUP BY 1""")
    return "".join(parts)


def _sparse_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    trade = (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .filter(
            F.pmod(F.col("o_custkey") * 7 + F.col("l_suppkey") * 13, F.lit(10)) < 3
        )
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + 1000000).alias("supp"),
        )
        .distinct()
        # both symmetrized union branches read this plan; uncheckpointed,
        # the join+distinct would execute once per branch
        .localCheckpoint(eager=False)
    )
    return trade.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).union(
        trade.select("supp", "cust")
    )


@register("kcore_nodes", _kcore_oracle(8, _ROUNDS))
def kcore_nodes(spark, sf_dir):
    """Nodes of the 8-core of the sparsified trade graph after 4 peel
    rounds (fixpoint by round 2 there — pytest pins deep cascades on
    crafted chains), with residual degrees; bit-exact vs the
    SQL-unrolled rounds (1196 nodes at sf0.01)."""
    return kcore_peel(_sparse_trade_edges(spark, sf_dir), k=8, rounds=_ROUNDS)
