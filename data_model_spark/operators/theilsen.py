"""Theil-Sen slope estimator per series — Mann-Kendall's companion.

Where `mannkendall.py` answers *is there* a monotone trend, Theil-Sen
answers *how steep*: the median of all pairwise slopes
``(v_j - v_i) / (t_j - t_i)`` over a time series — the standard robust
trend magnitude in EO change analysis (NDVI greening/browning rates,
subsidence velocities), with a 29.3% breakdown point against outliers
(Sen 1968; the same pairing the emerging-hot-spot toolchain reports
next to the MK verdict).

Spark-first shape: the identical WITHIN-SERIES self-equi-join as the
MK operator (one hash shuffle on the series key), then the median by a
window ``row_number`` ordered by slope — the window partitions by the
SAME key the join shuffled on, so AQE reuses the partitioning and no
second exchange appears.  The honest scale boundary is MK's, stated
there: n(n-1)/2 pair rows per series; for very long series the
O(n log n) per-group kernel inside ``applyInPandas`` is the right
physical plan.

Exactness: values quantize to integer cents, timestamps to integer
epoch seconds (only DIFFERENCES are used, so any engine-constant epoch
offset cancels); each slope is one IEEE division of exact integers —
bit-identical across engines — and the LOWER median (element at
row_number ceil(n/2)) avoids the even-count averaging halfway case.
Slopes transport as HALF-UP micro-units.  Oracle: full generative
DuckDB SQL twin with the identical window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def theil_sen(events: DataFrame) -> DataFrame:
    """(user_id, n_slopes, slope_micro) per user series."""
    e = events.selectExpr(
        "user_id",
        "CAST(unix_timestamp(ts) AS BIGINT) AS t",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v",
    )
    a = e.selectExpr("user_id", "t AS ta", "v AS va")
    b = e.selectExpr("user_id", "t AS tb", "v AS vb")
    pairs = (
        a.join(b, "user_id")
        .where("ta < tb")
        .selectExpr(
            "user_id",
            "CAST(vb - va AS DOUBLE) / CAST(tb - ta AS DOUBLE) AS slope",
        )
    )
    w = Window.partitionBy("user_id").orderBy("slope")
    ranked = pairs.select(
        "user_id",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    return ranked.where("rn * 2 = n + (n % 2)").selectExpr(
        "user_id",
        "n AS n_slopes",
        "CAST(FLOOR(slope * 1000000 + 0.5) AS BIGINT) AS slope_micro",
    )


_TS_ORACLE = """
WITH e AS (
  SELECT user_id, CAST(epoch(ts) AS BIGINT) AS t,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events),
pairs AS (
  SELECT a.user_id,
         CAST(b.v - a.v AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
  FROM e a JOIN e b ON a.user_id = b.user_id AND a.t < b.t),
ranked AS (
  SELECT user_id, slope,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM pairs)
SELECT user_id, CAST(n AS BIGINT) AS n_slopes,
       CAST(FLOOR(slope * 1000000 + 0.5) AS BIGINT) AS slope_micro
FROM ranked WHERE rn * 2 = n + (n % 2)"""


@register("theil_sen_slope", _TS_ORACLE)
def theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Theil-Sen median slope over the events table — the
    robust trend magnitude next to `mann_kendall_trend`'s verdict."""
    return theil_sen(load_table(spark, sf_dir, "events"))
