"""Gap-based sessionization over the events table.

The canonical event-pipeline operator the engine was still missing: group
each user's events into sessions separated by more than ``gap`` of
inactivity.  The break rule is ``diff > gap`` — an event exactly ``gap``
after its predecessor stays in the SAME session — empirically matching
Spark's native ``session_window``, which merges windows that touch
(tests/test_sessions.py pins the boundary case against the real
streaming operator), so the streaming twin agrees on boundaries exactly.
Batch formulation is the two-window classic:

    new_session = (ts - lag(ts) over (user ORDER BY ts, event_id)) > gap
    session_idx = running sum of new_session over the same window

— one shuffle on ``user_id``, two window passes over sorted runs, no
self-join.  All timestamp arithmetic is integer microseconds
(``unix_micros`` / DuckDB ``epoch_us``), so the session boundaries are
bit-identical across engines and the oracle is exact.

Scale: the shuffle key is the user — the natural partitioning of any
event store; a hot user is bounded by one reducer's sort run (sessions
are computed in a single streamed pass over the sorted run, no
materialized per-user state).  The streaming twin
(``streaming/sessions.py``) runs the same semantics incrementally with
``session_window`` + watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

# 6 h: the synthetic events run ~2 events/user/day, so a web-style 30-min
# gap degenerates to single-event sessions; 6 h yields real multi-event
# sessions (~1.7 events/session at sf0.001) while still splitting days
GAP_MINUTES = 360


def sessionize(
    events: DataFrame, gap_minutes: int = GAP_MINUTES
) -> DataFrame:
    """Per-user sessions: (user_id, session_idx, n_events, start/end micros).

    ``session_idx`` is 1-based in first-event order within each user.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    ev = events.withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = (
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > gap_us, F.lit(1)
        )
        .otherwise(F.lit(0))
    )
    run = (
        ev.withColumn("_new", new_sess)
        .withColumn(
            "session_idx",
            F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            + 1,
        )
    )
    return run.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("ts_us").alias("t_start_us"),
        F.max("ts_us").alias("t_end_us"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


_SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
flagged AS (
  SELECT user_id, event_id, value, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w > {GAP_MINUTES * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
runs AS (
  SELECT user_id, value, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) + 1 AS session_idx
  FROM flagged)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(ts_us) AS t_start_us,
       MAX(ts_us) AS t_end_us,
       ROUND(SUM(value), 6) AS sum_value
FROM runs GROUP BY user_id, session_idx"""


@register("sessionize", _SESSION_ORACLE)
def sessionize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-hour-gap user sessionization of the events table."""
    return sessionize(load_table(spark, sf_dir, "events"))


_STREAM_SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events),
flagged AS (
  SELECT user_id, event_id, value, ts_us,
         CASE WHEN ts_us - LAG(ts_us) OVER w > {GAP_MINUTES * 60 * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
runs AS (
  SELECT user_id, value, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged)
SELECT user_id, MIN(ts_us) AS t_start_us,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 6) AS sum_value
FROM runs GROUP BY user_id, session_idx"""


@register("streaming_sessions", _STREAM_SESSION_ORACLE)
def streaming_sessions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window + watermark sessionization, flush-drained.

    The append-mode streaming query only emits a session after the
    watermark passes it, so the drain harness appends a sentinel event
    far past the real data (separate, later micro-batch) to advance the
    watermark and flush every real session out of state; the sentinel's
    own session is filtered by its reserved user_id.  Result must equal
    the batch gap-sessionization (the oracle) row-for-row.
    """
    import os

    from ..streaming.sessions import streaming_sessions

    return streaming_sessions(
        spark, os.path.join(sf_dir, "events.parquet"), gap_minutes=GAP_MINUTES
    )


WEEK_US = 7 * 86400 * 1_000_000


def cohort_retention(events: DataFrame) -> DataFrame:
    """Weekly cohort retention matrix: (cohort_week, week_offset, n_users).

    Weeks are epoch-aligned integer buckets (``ts_us // WEEK_US``) — pure
    int64 arithmetic, so the matrix is bit-identical across engines (no
    calendar/timezone semantics to disagree on).  cohort = a user's first
    active week; n_users = distinct users of that cohort active at
    cohort + offset.  Two aggregations: distinct (user, week) activity,
    then a join of the per-user cohort table, then the matrix rollup —
    the 10^12-row shape, since both shuffles key on user/cohort.  The
    cohort table has one row per distinct user, so it grows with the
    data: the join is NOT hint-forced (AQE broadcasts it when small,
    shuffles on user_id — the clustering both sides already share —
    when not).
    """
    # floor division, not `div` (which truncates toward zero): pre-1970
    # timestamps — dirty data a curation pass must survive — have negative
    # epoch micros, where truncation and the oracle's floor() disagree.
    # (x - pmod(x, w)) / w is an exact integer floor for any sign.
    wk = F.expr(
        "cast((unix_micros(cast(ts as timestamp))"
        f" - pmod(unix_micros(cast(ts as timestamp)), {WEEK_US}))"
        f" / {WEEK_US} as long)"
    )
    active = events.select("user_id", wk.alias("wk")).distinct()
    cohort = active.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


_COHORT_ORACLE = f"""
WITH active AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / {7 * 86400 * 1_000_000}) AS BIGINT) AS wk
  FROM events),
cohort AS (SELECT user_id, MIN(wk) AS cohort_wk FROM active GROUP BY user_id)
SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN cohort c USING (user_id)
GROUP BY c.cohort_wk, a.wk - c.cohort_wk"""


@register("cohort_retention", _COHORT_ORACLE)
def cohort_retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the events table."""
    return cohort_retention(load_table(spark, sf_dir, "events"))
