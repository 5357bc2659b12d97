"""Trajectory kinematics QA: per-user speed profile + GPS-jump screen.

Before any movement analytics (DTW, stay points, map matching — all in
this engine), fleets screen raw fixes for teleports: a segment whose
implied speed exceeds a physical ceiling is a GPS glitch, and a track
with many is untrustworthy.  This computes per-consecutive-segment
planar speeds on the integer milli-degree walk and aggregates a
per-user QA row.

Exactness: displacement components are exact int64 (the congruential
walk), dt is exact int64 microseconds, and the per-segment speed is ONE
double division quantized to an integer micro-rate before any
aggregation — sums of quantized int64 are order-independent, so the
result is bit-stable at any parallelism and the oracle is GENERATIVE
DuckDB SQL over the identical expression tree (the ``traj_resample``
fidelity argument).

Scale: one shuffle on user_id (the lag window), then a map-side
combinable groupBy on the same key — Catalyst reuses the partitioning,
so the whole operator is a single exchange at 10^12 fixes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register

VMAX_Q = 50_000_000  # jump threshold on the quantized micro-rate


def user_kinematics(ev: DataFrame) -> DataFrame:
    """(user_id, n_segs, n_jumps, max_speed_q, sum_speed_q): planar
    speed profile of each user's fix sequence.

    ``ev`` needs (event_id, ts, user_id); positions are the shared
    congruential milli-degree walk, speeds are |d| (Chebyshev metric —
    max of the axis displacements, division-free before the one
    quantized rate) per microsecond scaled 1e12.
    """
    d = (
        ev.withColumn("t", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn("dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10)
        .withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = d.withColumn("xm", F.sum("dlon").over(w)).withColumn(
        "ym", F.sum("dlat").over(w)
    )
    seg = (
        pos.withColumn("t0", F.lag("t").over(w))
        .withColumn("x0", F.lag("xm").over(w))
        .withColumn("y0", F.lag("ym").over(w))
        .filter(F.col("t0").isNotNull() & (F.col("t") > F.col("t0")))
    )
    disp = F.greatest(
        F.abs(F.col("xm") - F.col("x0")), F.abs(F.col("ym") - F.col("y0"))
    )
    speed_q = F.floor(
        disp.cast("double") / (F.col("t") - F.col("t0")).cast("double") * 1e12
        + 0.5
    ).cast("long")
    s = seg.withColumn("sq", speed_q)
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum((F.col("sq") > VMAX_Q).cast("long")).alias("n_jumps"),
        F.max("sq").alias("max_speed_q"),
        F.sum("sq").alias("sum_speed_q"),
    )


_ORACLE = f"""
WITH d AS (
  SELECT event_id, user_id, epoch_us(ts) AS t,
         event_id * 37 % 21 - 10 AS dlon,
         event_id * 91 % 21 - 10 AS dlat
  FROM events),
p AS (
  SELECT user_id, event_id, t,
         SUM(dlon) OVER w AS xm, SUM(dlat) OVER w AS ym
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
s AS (
  SELECT user_id, t, xm, ym,
         LAG(t) OVER w AS t0, LAG(xm) OVER w AS x0, LAG(ym) OVER w AS y0
  FROM p
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
q AS (
  SELECT user_id,
         CAST(FLOOR(CAST(GREATEST(abs(xm - x0), abs(ym - y0)) AS DOUBLE)
                    / CAST(t - t0 AS DOUBLE) * 1e12 + 0.5) AS BIGINT) AS sq
  FROM s WHERE t0 IS NOT NULL AND t > t0)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(CASE WHEN sq > {VMAX_Q} THEN 1 ELSE 0 END) AS BIGINT) AS n_jumps,
       CAST(MAX(sq) AS BIGINT) AS max_speed_q,
       CAST(SUM(sq) AS BIGINT) AS sum_speed_q
FROM q GROUP BY user_id
"""


@register("traj_kinematics", _ORACLE)
def traj_kinematics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user speed/jump QA over the event walks — one exchange
    (window + same-key groupBy), generative SQL oracle."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    return user_kinematics(ev)


_CUBE_ORACLE = """
WITH d AS (
  SELECT event_id, epoch_us(ts) AS t,
         10.0 + (event_id * 37 % 2000) / 1000.0 AS lon,
         46.0 + (event_id * 91 % 2000) / 1000.0 AS lat
  FROM events),
b AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * 4096) AS BIGINT) AS tx,
         CAST(floor((lat + 90.0) / 180.0 * 4096) AS BIGINT) AS ty,
         t // 604800000000 AS wk
  FROM d)
SELECT tx, ty, wk, CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY tx, ty, wk
"""


@register("spacetime_cube", _CUBE_ORACLE)
def spacetime_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The space-time cube: acquisition counts per (res-12 cell, epoch
    week) — the integer-exact base layer of emerging-hot-spot analysis
    (pair with ``mann_kendall_trend`` per cell over the week axis)."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    d = (
        ev.withColumn("t", F.unix_micros(F.col("ts").cast("timestamp")))
        .withColumn(
            "lon", 10.0 + F.pmod(F.col("event_id") * 37, F.lit(2000)) / 1000.0
        )
        .withColumn(
            "lat", 46.0 + F.pmod(F.col("event_id") * 91, F.lit(2000)) / 1000.0
        )
    )
    b = d.select(
        F.floor((F.col("lon") + 180.0) / 360.0 * 4096).cast("long").alias("tx"),
        F.floor((F.col("lat") + 90.0) / 180.0 * 4096).cast("long").alias("ty"),
        F.expr("t DIV 604800000000").alias("wk"),
    )
    return b.groupBy("tx", "ty", "wk").agg(F.count(F.lit(1)).alias("n"))
