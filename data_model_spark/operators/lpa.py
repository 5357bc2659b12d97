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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .kcore import _SPARSE_EDGES_CTE, _sparse_trade_edges
from .registry import register

_ROUNDS = 3


def lpa_communities(edges: DataFrame, rounds: int = _ROUNDS) -> DataFrame:
    """(node, community) after ``rounds`` synchronous LPA rounds; labels
    initialize to the node id."""
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
