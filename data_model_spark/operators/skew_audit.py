"""Key-skew audit: the observability query behind the salting decisions.

Every skew mitigation in this engine (salted shingle joins, salted PIP,
AQE skew splits) is justified by a key-frequency distribution; this
operator computes that distribution's summary for a spatial cell key —
the number a pipeline operator dashboards before deciding ``salt=k``:

* ``gini`` — exact Gini coefficient of the per-cell counts, computed as
  integers over the counts sorted by (count, cell):
      G = sum_i (2i - n - 1) c_(i)  /  (n * total)
  (numerator and denominator exact int64; ONE correctly-rounded
  division at the end);
* ``top1_share`` / ``top16_share`` — the mass of the heaviest cells, the
  direct "how bad is the hottest reducer" number.

Scale shape: one count aggregation on the cell key (bounded by the grid,
not the corpus), then rank/sum windows over that bounded table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .layout import grid_points
from .registry import register


def cell_skew_audit(points: DataFrame) -> DataFrame:
    """One row: (n_cells, total, max_count, gini, top1_share, top16_share)."""
    counts = points.groupBy("gx", "gy").agg(F.count("*").alias("c"))
    ranked = counts.withColumns(
        {
            "i": F.row_number().over(Window.orderBy("c", "gx", "gy")),
            "r": F.row_number().over(
                Window.orderBy(F.col("c").desc(), "gx", "gy")
            ),
            "n": F.count("*").over(Window.partitionBy()),
        }
    )
    agg = ranked.agg(
        F.count("*").alias("n_cells"),
        F.sum("c").alias("total"),
        F.max("c").alias("max_count"),
        F.sum(
            (F.lit(2) * F.col("i") - F.col("n") - 1) * F.col("c")
        ).alias("_gnum"),
        F.sum(F.when(F.col("r") <= 1, F.col("c")).otherwise(0)).alias("_t1"),
        F.sum(F.when(F.col("r") <= 16, F.col("c")).otherwise(0)).alias("_t16"),
    )
    return agg.select(
        "n_cells",
        "total",
        "max_count",
        F.round(F.col("_gnum") / (F.col("n_cells") * F.col("total")), 6).alias(
            "gini"
        ),
        F.round(F.col("_t1") / F.col("total"), 6).alias("top1_share"),
        F.round(F.col("_t16") / F.col("total"), 6).alias("top16_share"),
    )


_SKEW_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS point_id,
         (c_custkey * 7919) % 64 AS gx,
         (c_custkey * 104729) % 64 AS gy
  FROM customer
), counts AS (
  SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY 1, 2
), ranked AS (
  SELECT c, gx, gy,
         ROW_NUMBER() OVER (ORDER BY c, gx, gy) AS i,
         ROW_NUMBER() OVER (ORDER BY c DESC, gx, gy) AS r
  FROM counts
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(c) AS BIGINT) AS total,
         MAX(c) AS max_count,
         CAST(SUM((2 * i - (SELECT COUNT(*) FROM counts) - 1) * c) AS BIGINT) AS gnum,
         CAST(SUM(CASE WHEN r <= 1 THEN c ELSE 0 END) AS BIGINT) AS t1,
         CAST(SUM(CASE WHEN r <= 16 THEN c ELSE 0 END) AS BIGINT) AS t16
  FROM ranked)
SELECT n_cells, total, max_count,
       ROUND(CAST(gnum AS DOUBLE) / (n_cells * total), 6) AS gini,
       ROUND(CAST(t1 AS DOUBLE) / total, 6) AS top1_share,
       ROUND(CAST(t16 AS DOUBLE) / total, 6) AS top16_share
FROM s"""


@register("cell_skew_audit", _SKEW_ORACLE)
def cell_skew_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew summary of the 64x64 cell key over customer-derived points."""
    return cell_skew_audit(grid_points(load_table(spark, sf_dir, "customer")))
