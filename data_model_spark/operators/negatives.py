"""Negative-edge sampling for link-prediction training data.

Graph-ML training needs, for every positive edge set, a matched set of
NEGATIVES — node pairs that are NOT edges — sampled reproducibly.  The
distributed recipe: derive candidate partners per node by pure hash
arithmetic (no RNG state, layout-independent), then ONE anti-join
against the edge set removes accidental positives; self-pairs are
filtered arithmetically.

Candidates for node u: partner_i(u) = md5_60('neg:' u ':' i) % n_nodes
mapped into the node-id space, for i in 0..k-1 — the same
content-addressed determinism as ``operators/sampling.py`` (re-running,
repartitioning, or scaling executors cannot change the sample).

Scale shape: a k-way ``sequence`` explode (narrow), one hash anti-join
on the edge key — both bounded; the anti-join is the same shape the
decontamination suite runs at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import MD5_60_SQL, md5_60
from .kcore import _SPARSE_EDGES_CTE, _sparse_trade_edges
from .registry import register

K_NEG = 4


def negative_edges(edges: DataFrame, k: int = K_NEG) -> DataFrame:
    """(src, dst_neg) pairs per edge-set node: k hash-derived candidates
    each, minus real edges and self-pairs.

    Partners are drawn from the ACTUAL node set (dense-ranked ids), so
    candidates are valid nodes even in sparse id spaces.
    """
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    # index the node set once (tiny: |V| rows) and broadcast the mapping
    idx = nodes.select(
        "node", (F.pmod(md5_60(F.col("node").cast("string")), F.lit(1 << 40))).alias("_o")
    )
    from pyspark.sql.window import Window

    idx = idx.withColumn(
        "pos", F.row_number().over(Window.orderBy("_o", "node")) - 1
    ).drop("_o")
    cand = (
        nodes.withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .withColumn(
            "pos",
            F.pmod(
                md5_60(
                    F.concat(
                        F.lit("neg:"),
                        F.col("node").cast("string"),
                        F.lit(":"),
                        F.col("i").cast("string"),
                    )
                ),
                F.lit(n_nodes),
            ),
        )
        .join(F.broadcast(idx.withColumnRenamed("node", "dst_neg")), "pos")
        .select(F.col("node").alias("src"), "dst_neg", "i")
        .filter(F.col("src") != F.col("dst_neg"))
    )
    return cand.join(
        edges.withColumnRenamed("dst", "dst_neg"), ["src", "dst_neg"], "left_anti"
    ).select("src", "dst_neg", "i")


def _oracle() -> str:
    h_node = MD5_60_SQL.format(col="CAST(node AS VARCHAR)")
    h_cand = MD5_60_SQL.format(
        col="'neg:' || CAST(node AS VARCHAR) || ':' || CAST(i AS VARCHAR)"
    )
    return f"""
WITH {_SPARSE_EDGES_CTE[1:]},
nodes AS (SELECT DISTINCT src AS node FROM e0),
nn AS (SELECT COUNT(*) AS n FROM nodes),
idx AS (
  SELECT node,
         ROW_NUMBER() OVER (ORDER BY {h_node} % {1 << 40}, node) - 1 AS pos
  FROM nodes),
cand AS (
  SELECT n.node AS src, {h_cand} % (SELECT n FROM nn) AS pos, i
  FROM nodes n, generate_series(0, {K_NEG - 1}) AS t(i)),
named AS (
  SELECT c.src, x.node AS dst_neg, c.i
  FROM cand c JOIN idx x USING (pos)
  WHERE c.src != x.node)
SELECT src, dst_neg, CAST(i AS BIGINT) AS i FROM named
WHERE NOT EXISTS (
  SELECT 1 FROM e0 e WHERE e.src = named.src AND e.dst = named.dst_neg)"""


@register("negative_edges", _oracle)
def negative_edges_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-sampled non-edges of the sparsified trade graph
    (k=4 candidates per node, anti-joined against real edges)."""
    return negative_edges(_sparse_trade_edges(spark, sf_dir)).withColumn(
        "i", F.col("i").cast("long")
    )
