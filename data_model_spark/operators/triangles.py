"""Triangle counting via degree-ordered wedge joins.

Third member of the graph suite (``components.py``, ``pagerank.py``):
per-node triangle counts — the local clustering signal spam/quality
pipelines compute over co-occurrence graphs.

Algorithm (Cohen 2009 / Suri & Vassilvitskii WWW'11, the MapReduce
standard): orient every undirected edge from its lower to its higher
endpoint under the total order ``(degree, node)``; each triangle
{x,y,z} then has exactly one "apex" x with oriented edges x->y, x->z
and closing edge y->z, so

    wedges  = oriented self-join on the apex        (one shuffle)
    triangs = wedges semi-joined with oriented edges (one shuffle)

Degree ordering is the load-bearing choice at scale: a celebrity node
of degree d contributes wedges by its OUT-degree, which the ordering
caps at O(sqrt(m)) — the join never quadratically explodes on hubs the
way id-ordering would.  Everything is exact integer arithmetic; the
DuckDB oracle replays the same orientation and joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def triangle_counts(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """(node, n_tri) for every node on >= 1 triangle of the undirected,
    deduplicated edge set (self-loops ignored)."""
    e = (
        edges.select(
            F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed("a", "n")
    # orient by (deg, node): src is the smaller endpoint under the order
    ed = (
        e.join(deg.withColumnRenamed("n", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("n", "b").withColumnRenamed("deg", "db"), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    )
    # wedges at the apex; order the two spokes by (deg, node) so the
    # closing edge is exactly the oriented edge y->z
    w1, w2 = o.alias("w1"), o.alias("w2")
    spoke_lt = (F.col("w1.ddst") < F.col("w2.ddst")) | (
        (F.col("w1.ddst") == F.col("w2.ddst"))
        & (F.col("w1.dst") < F.col("w2.dst"))
    )
    wedges = w1.join(w2, (F.col("w1.src") == F.col("w2.src")) & spoke_lt).select(
        F.col("w1.src").alias("x"),
        F.col("w1.dst").alias("y"),
        F.col("w2.dst").alias("z"),
    )
    closing = o.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = wedges.join(closing, ["y", "z"], "left_semi")
    corners = (
        tri.select(F.col("x").alias("node"))
        .union(tri.select(F.col("y").alias("node")))
        .union(tri.select(F.col("z").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("n_tri"))


# ---------------------------------------------------------------------------
# registered query: parts co-purchased within an order
# ---------------------------------------------------------------------------

_TRI_ORACLE = """
WITH pairs AS (
  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                  greatest(a.l_partkey, b.l_partkey) AS b
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM (
    SELECT a AS n FROM pairs UNION ALL SELECT b FROM pairs) GROUP BY n),
o AS (
  SELECT CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN p.a ELSE p.b END AS src,
         CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN p.b ELSE p.a END AS dst,
         CASE WHEN (da.deg, p.a) < (db.deg, p.b) THEN db.deg ELSE da.deg END AS ddst
  FROM pairs p JOIN deg da ON da.n = p.a JOIN deg db ON db.n = p.b),
tri AS (
  SELECT w1.src AS x, w1.dst AS y, w2.dst AS z
  FROM o w1 JOIN o w2
    ON w1.src = w2.src AND (w1.ddst, w1.dst) < (w2.ddst, w2.dst)
  WHERE EXISTS (SELECT 1 FROM o c WHERE c.src = w1.dst AND c.dst = w2.dst)),
corners AS (
  SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM corners GROUP BY node"""


@register("triangle_counts", _TRI_ORACLE)
def triangle_counts_query(spark, sf_dir):
    """Per-part triangle counts of the co-purchase graph (parts sharing an
    order); oracle replays the identical degree-ordered wedge join."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    return triangle_counts(pairs)
