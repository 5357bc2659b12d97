"""Seasonal decomposition per series: centered-MA trend + phase index.

The classical additive decomposition (the moving-average core of
STL-lite): trend = centered moving average over one full period,
detrended = value - trend, seasonal index = per-phase mean of the
detrended values.  In EO time-series QA this is the per-cell
phenology/diurnal profile extractor; in event analytics the
day-of-week profile that baselines anomaly screens.

Determinism contract (the `kinematics` rule): every aggregation is an
INTEGER sum — values are cents, the trend window keeps (sum, count)
exact, and the per-row detrended value is quantized to int64 micro
units with ONE double division + FLOOR before any shuffle-order-
dependent aggregation touches it.  The per-phase mean is again
(int sum, count) folded by one final division.  Rows whose centered
window is truncated at the series edge are excluded (count < period)
rather than padded — same rule in both engines.

Spark-first shape: one shuffle to the series key; the ordering window
(`row_number`), the centered frame, and the (user, phase) groupBy all
partition on user_id, so AQE keeps a single exchange.  Oracle: full
generative DuckDB SQL twin with the identical windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

PERIOD = 7
HALF = PERIOD // 2


def seasonal_profile(events: DataFrame) -> DataFrame:
    """(user_id, phase, n_obs, seas_micro) per series and phase."""
    e = events.selectExpr(
        "user_id", "ts", "event_id",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v",
    )
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "user_id", "v", (F.row_number().over(order_w) - 1).alias("seq")
    )
    frame = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(-HALF, HALF)
    )
    t = o.select(
        "user_id",
        "v",
        "seq",
        F.sum("v").over(frame).alias("tsum"),
        F.count(F.lit(1)).over(frame).alias("tcnt"),
    )
    d = t.where(F.col("tcnt") == PERIOD).selectExpr(
        "user_id",
        f"seq % {PERIOD} AS phase",
        f"CAST(FLOOR((v - tsum / {float(PERIOD)!r}) * 1000000 + 0.5)"
        " AS BIGINT) AS dmicro",
    )
    return d.groupBy("user_id", "phase").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.expr(
            "CAST(FLOOR(CAST(SUM(dmicro) AS DOUBLE) / COUNT(*) + 0.5)"
            " AS BIGINT)"
        ).alias("seas_micro"),
    )


_SEASONAL_ORACLE = f"""
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events),
o AS (
  SELECT user_id, v,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS seq
  FROM e),
t AS (
  SELECT user_id, v, seq,
         SUM(v) OVER w AS tsum, COUNT(*) OVER w AS tcnt
  FROM o
  WINDOW w AS (PARTITION BY user_id ORDER BY seq
               ROWS BETWEEN {HALF} PRECEDING AND {HALF} FOLLOWING)),
d AS (
  SELECT user_id, seq % {PERIOD} AS phase,
         CAST(FLOOR((v - tsum / {float(PERIOD)!r}) * 1000000 + 0.5)
              AS BIGINT) AS dmicro
  FROM t WHERE tcnt = {PERIOD})
SELECT user_id, phase, CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(FLOOR(CAST(SUM(dmicro) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
         AS seas_micro
FROM d GROUP BY user_id, phase"""


@register("seasonal_profile", _SEASONAL_ORACLE)
def seasonal_profile_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user period-7 seasonal indices over the events table —
    centered-MA detrending with order-independent integer sums."""
    return seasonal_profile(load_table(spark, sf_dir, "events"))
