"""Trajectory time-resampling: linear interpolation onto a regular
time grid.

Tracks arrive with irregular timestamps; sampling-rate normalization
(resample to a fixed cadence) is the standard pre-step before DTW /
stay-point / map-matching comparisons so that distances weight time
uniformly.  For every consecutive pair of fixes of a user this emits
the grid instants in the half-open interval (t0, t1] at a fixed period
and linearly interpolates the position at each — positions quantized to
integer micro-degrees HALF-UP so cross-engine transport is exact.

Spark-first shape: the whole operator is window functions + one
``sequence`` explode + pure column arithmetic — no UDFs, one shuffle on
``user_id`` shared by both windows (Catalyst reuses the partitioning),
output proportional to trip-time / period.  At 10^12 fixes the plan is
a single hash partition by user plus a map-side explode.

Oracle: GENERATIVE DuckDB SQL — the same cumulative-walk positions,
``generate_series`` grid and IEEE-754 double lerp expression, so
agreement is per-row and bit-level (both engines evaluate the identical
double expression tree; the quantization floor happens on the same
double).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register

GRID_US = 14_400_000_000  # 4 h in microseconds


def resample_trajectories(ev: DataFrame, grid_us: int = GRID_US) -> DataFrame:
    """(user_id, tg, qx, qy): lerped fixes at the grid instants inside
    each consecutive-pair interval (t0, t1], positions in micro-degrees.

    ``ev`` needs (event_id, ts, user_id); positions are the
    deterministic congruential walk shared with ``trajectory_cell_cover``
    (dlon/dlat from event_id, cumulative over the per-user time order).
    """
    d = (
        ev.withColumn("t", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10)
        .withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = d.withColumn("lon1", 10.0 + F.sum("dlon").over(w) / 1000.0).withColumn(
        "lat1", 46.0 + F.sum("dlat").over(w) / 1000.0
    )
    seg = (
        pos.withColumn("t0", F.lag("t").over(w))
        .withColumn("lon0", F.lag("lon1").over(w))
        .withColumn("lat0", F.lag("lat1").over(w))
        .filter(F.col("t0").isNotNull() & (F.col("t") > F.col("t0")))
    )
    g = grid_us
    grid = seg.withColumn("g0", F.expr(f"(t0 DIV {g} + 1) * {g}")).withColumn(
        "tg",
        F.explode(
            F.when(
                F.col("g0") <= F.col("t"),
                F.sequence(F.col("g0"), F.col("t"), F.lit(g)),
            ).otherwise(F.array().cast("array<bigint>"))
        ),
    )
    frac = (F.col("tg") - F.col("t0")).cast("double") / (
        F.col("t") - F.col("t0")
    ).cast("double")
    qx = F.floor(
        (F.col("lon0") + (F.col("lon1") - F.col("lon0")) * frac) * 1e6 + 0.5
    ).cast("long")
    qy = F.floor(
        (F.col("lat0") + (F.col("lat1") - F.col("lat0")) * frac) * 1e6 + 0.5
    ).cast("long")
    return grid.select("user_id", "tg", qx.alias("qx"), qy.alias("qy"))


_ORACLE = f"""
WITH d AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         event_id * 37 % 21 - 10 AS dlon,
         event_id * 91 % 21 - 10 AS dlat
  FROM events),
p AS (
  SELECT user_id, event_id, t,
         10.0 + SUM(dlon) OVER w / 1000.0 AS lon1,
         46.0 + SUM(dlat) OVER w / 1000.0 AS lat1
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
s AS (
  SELECT user_id, t, lon1, lat1,
         LAG(t) OVER w AS t0,
         LAG(lon1) OVER w AS lon0,
         LAG(lat1) OVER w AS lat0
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
g AS (
  SELECT user_id, t, t0, lon0, lat0, lon1, lat1,
         unnest(generate_series((t0 // {GRID_US} + 1) * {GRID_US}, t,
                                {GRID_US})) AS tg
  FROM s WHERE t0 IS NOT NULL AND t > t0)
SELECT user_id, tg,
       CAST(FLOOR((lon0 + (lon1 - lon0)
                   * (CAST(tg - t0 AS DOUBLE) / CAST(t - t0 AS DOUBLE)))
                  * 1e6 + 0.5) AS BIGINT) AS qx,
       CAST(FLOOR((lat0 + (lat1 - lat0)
                   * (CAST(tg - t0 AS DOUBLE) / CAST(t - t0 AS DOUBLE)))
                  * 1e6 + 0.5) AS BIGINT) AS qy
FROM g
"""


@register("traj_resample", _ORACLE)
def traj_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-cadence resample of the per-user event walks — every 4 h
    grid instant inside each fix interval, positions lerped and
    micro-degree quantized; generative SQL oracle."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    return resample_trajectories(ev)
