"""CUSUM changepoint detection over event streams — integer-exact.

Data pipelines watch per-stream statistics for distribution shifts
(ingestion drift, sensor steps, source regressions).  The classic
offline detector is the CUSUM statistic: with observations x_1..x_n and
S_t = sum_{i<=t} (x_i - mean), the changepoint estimate is
argmax_t |S_t| (the single-changepoint MLE for a mean shift).

Cross-engine exactness without a single float: values are lattice-
quantized to integer cents (``floor(value*100 + 0.5)`` — one
deterministic double op), and the mean subtraction is cleared of
division by scaling:  n * S_t = n * cumsum_t - t * total  (all int64).
argmax over |n*S_t| with earliest-t tie-break is then pure integer
ordering, identical in Spark and DuckDB.

Scale shape: one window cumsum per stream (the per-key ordered
partition — a single hash shuffle on event_type), a broadcast-size
per-stream totals join, and a WindowGroupLimit top-1 per stream (rank
filter -> per-partition bounded heaps, no full sort).  int64 bound:
|n*S_t| <= 2 * n * sum|x| — at 10^5-cent values this stays exact to
~10^8 rows per stream; larger streams chunk by time and merge, the
standard production decomposition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


def cusum_changepoints(
    events: DataFrame,
    key_col: str = "event_type",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-stream CUSUM changepoint: (key, n, cp_idx, cp_order, ns_at_cp).

    ``cp_idx`` is the 1-based position t maximizing |n*S_t| (earliest on
    ties); ``ns_at_cp`` the signed integer statistic n*S_t there.
    """
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("key").orderBy("ord")
    rows = events.select(
        F.col(key_col).alias("key"), F.col(order_col).alias("ord"), cents.alias("c")
    ).withColumns(
        {
            "t": F.row_number().over(w),
            "cum": F.sum("c").over(w),
        }
    )
    totals = rows.groupBy("key").agg(
        F.count("*").alias("n"), F.sum("c").alias("total")
    )
    scored = rows.join(F.broadcast(totals), "key").withColumn(
        "ns", F.col("n") * F.col("cum") - F.col("t") * F.col("total")
    )
    pick = Window.partitionBy("key").orderBy(
        F.abs(F.col("ns")).desc(), F.col("t")
    )
    return (
        scored.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "key",
            "n",
            F.col("t").cast("long").alias("cp_idx"),
            F.col("ord").alias("cp_order"),
            F.col("ns").alias("ns_at_cp"),
        )
    )


_CUSUM_ORACLE = """
WITH rows_q AS (
  SELECT event_type AS key, event_id AS ord,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS t,
         SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY event_id) AS cum
  FROM events
), totals AS (
  SELECT key, CAST(COUNT(*) AS BIGINT) AS n, SUM(c) AS total
  FROM rows_q GROUP BY key
), scored AS (
  SELECT r.key, r.ord, r.t, tt.n,
         -- DuckDB SUMs of BIGINT widen to HUGEINT; fold back (values are
         -- proven in-range by the int64 bound in the module docstring)
         CAST(tt.n * CAST(r.cum AS BIGINT)
              - r.t * CAST(tt.total AS BIGINT) AS BIGINT) AS ns
  FROM rows_q r JOIN totals tt USING (key)
), ranked AS (
  SELECT key, n, t, ord, ns,
         ROW_NUMBER() OVER (PARTITION BY key ORDER BY ABS(ns) DESC, t) AS rk
  FROM scored)
SELECT key, n, CAST(t AS BIGINT) AS cp_idx, ord AS cp_order, ns AS ns_at_cp
FROM ranked WHERE rk = 1"""


@register("cusum_changepoints", _CUSUM_ORACLE)
def cusum_changepoints_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint over the events stream."""
    return cusum_changepoints(load_table(spark, sf_dir, "events"))
