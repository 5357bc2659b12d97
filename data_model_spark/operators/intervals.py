"""Distributed interval-overlap join (temporal theta join).

The missing relational primitive between equi-join and as-of join:
pairs (a, b) whose time intervals intersect — session-vs-session
attribution, maintenance-window overlap, validity-interval joins.  A
naive theta join is a cartesian product; the distributed form buckets
the time axis and turns overlap into ONE equi-join.

Plan: each interval explodes to the fixed-width buckets it covers
(pure JVM ``sequence``, bounded by interval_len/width + 1 rows); the
join key is (partition key, bucket); a pair is emitted in EXACTLY one
bucket — the one containing max(a.lo, b.lo), which both sides cover
whenever they overlap — so no distinct is needed; the exact int64
predicate ``a.lo <= b.hi AND b.lo <= a.hi`` refines.  This is the
standard interval-bucketing decomposition (cf. interval trees
flattened to grid files; same locality contract as ``radius_join``).

Determinism contract: all bounds are int64 microseconds, bucket ids are
integer floor division, the overlap length min(hi)-max(lo) is exact —
plan-independent and SQL-replayable.

Scale shape: the explode happens map-side before the one (key, bucket)
shuffle; bucket width trades explode factor against per-bucket fan-out
(hot buckets split via AQE skew handling).  With a partition key (user,
device, region) the join is time-sliced AND key-sliced: a day of one
user's 10^12-row history never meets another user's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def interval_join(
    a: DataFrame, b: DataFrame, bucket_us: int, key: str | None = "key"
) -> DataFrame:
    """(a_id, b_id, key, overlap_us): pairs of [lo, hi] closed intervals
    (int64 micros, columns id/lo/hi[/key]) that intersect; touching
    intervals count with overlap 0."""

    def cover(df, side):
        cols = [F.col("id").alias(f"{side}id"),
                F.col("lo").alias(f"{side}lo"), F.col("hi").alias(f"{side}hi")]
        if key:
            cols.append(F.col(key))
        return df.select(
            *cols,
            F.explode(
                F.sequence(
                    (F.col("lo") / bucket_us).cast("long"),
                    (F.col("hi") / bucket_us).cast("long"),
                )
            ).alias("bucket"),
        )

    ca, cb = cover(a, "a"), cover(b, "b")
    on = ["bucket"] + ([key] if key else [])
    first_shared = (
        F.greatest("alo", "blo") / bucket_us
    ).cast("long")
    out = (
        ca.join(cb, on)
        .filter(
            (F.col("alo") <= F.col("bhi"))
            & (F.col("blo") <= F.col("ahi"))
            & (F.col("bucket") == first_shared)
        )
        .select(
            F.col("aid").alias("a_id"),
            F.col("bid").alias("b_id"),
            *([F.col(key)] if key else []),
            (F.least("ahi", "bhi") - F.greatest("alo", "blo")).alias("overlap_us"),
        )
    )
    return out


_IVL_ORACLE = """
WITH a AS (
  SELECT event_id AS id, user_id AS key, epoch_us(ts) AS lo,
         epoch_us(ts) + (1 + event_id % 7) * 3600000000 AS hi
  FROM events WHERE event_type = 'click'),
b AS (
  SELECT event_id AS id, user_id AS key, epoch_us(ts) AS lo,
         epoch_us(ts) + (1 + event_id % 7) * 3600000000 AS hi
  FROM events WHERE event_type = 'purchase')
SELECT a.id AS a_id, b.id AS b_id, a.key AS key,
       CAST(LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo) AS BIGINT) AS overlap_us
FROM a JOIN b ON a.key = b.key AND a.lo <= b.hi AND b.lo <= a.hi"""


def _event_intervals(spark, sf_dir, event_type: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == event_type
    )
    lo = F.unix_micros(F.col("ts").cast("timestamp"))
    return ev.select(
        F.col("event_id").alias("id"),
        F.col("user_id").alias("key"),
        lo.alias("lo"),
        (lo + (1 + F.pmod("event_id", F.lit(7))) * 3_600_000_000).alias("hi"),
    )


@register("interval_overlap_join", _IVL_ORACLE)
def interval_overlap_join(spark, sf_dir):
    """Same-user click-session vs purchase-session interval overlaps
    (1-7 h synthetic sessions, 8 h buckets; 287 pairs at sf0.01) with
    exact overlap lengths; the oracle is the direct theta join, so a
    driver match proves bucket-cover completeness and the exactly-once
    emit rule."""
    a = _event_intervals(spark, sf_dir, "click")
    b = _event_intervals(spark, sf_dir, "purchase")
    return interval_join(a, b, bucket_us=8 * 3_600_000_000)
