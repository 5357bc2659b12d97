"""Slowly-changing-dimension (SCD Type 2) history building.

The classic warehouse versioning operator (Kimball's type-2 dimension):
collapse a change-event stream into validity intervals — one row per
(key, attribute-state) run with ``valid_from`` / ``valid_to`` and a
current flag.  Two window passes express it exactly:

1. change compression: keep an event iff it is the key's first or its
   tracked attributes differ from the previous event (lag);
2. interval assembly: ``valid_to`` = the next kept change's timestamp
   (lead), NULL marks the open current row.

All comparisons are on integer microseconds and plain equality, so the
result is plan-independent and the DuckDB oracle replays the identical
windows.  Late/duplicate timestamps order deterministically by
(ts, event_id).

Scale shape (100 TB of CDC events): one shuffle on the dimension key;
both windows run inside the same sort — Spark plans a single Window
stage over one Exchange, the minimal physical shape for the problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


def scd2_history(
    changes: DataFrame,
    key: str = "user_id",
    ts_us: str = "ts_us",
    order_tiebreak: str = "event_id",
    attr: str = "event_type",
) -> DataFrame:
    """(key, attr, valid_from_us, valid_to_us, is_current) — type-2 rows."""
    w = Window.partitionBy(key).orderBy(ts_us, order_tiebreak)
    kept = (
        changes.withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(ts_us, order_tiebreak)
    return kept.select(
        F.col(key),
        F.col(attr),
        F.col(ts_us).alias("valid_from_us"),
        F.lead(ts_us).over(w2).alias("valid_to_us"),
        F.lead(ts_us).over(w2).isNull().alias("is_current"),
    )


_SCD2_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
  FROM events),
kept AS (
  SELECT * FROM (
    SELECT user_id, event_type, event_id, ts_us,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
    FROM ev)
  WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type,
       ts_us AS valid_from_us,
       LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS valid_to_us,
       LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL AS is_current
FROM kept
"""


@register("scd2_history", _SCD2_ORACLE)
def scd2_history_query(spark, sf_dir):
    """Type-2 history of each user's event_type over the events stream;
    the oracle replays the identical change-compression + interval
    windows on integer microseconds."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return scd2_history(ev)


# ---------------------------------------------------------------------------
# as-of reconstruction (time travel over the type-2 history)
# ---------------------------------------------------------------------------

ASOF_US = 1_704_240_000_000_000  # 2024-01-03T00:00:00Z, mid-stream


def scd2_asof(history: DataFrame, at_us: int = ASOF_US) -> DataFrame:
    """Dimension state AS OF ``at_us``: the one validity interval per key
    containing the instant (valid_from <= T < valid_to, open row = +inf).

    The point-in-time query every type-2 dimension exists to answer; a
    pure filter over the history — no extra shuffle beyond the history's
    own window stage, and at 10^12 rows the predicate prunes on the
    interval columns' parquet min/max stats when the history is stored.
    """
    return history.filter(
        (F.col("valid_from_us") <= at_us)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > at_us))
    )


@register(
    "scd2_asof",
    _SCD2_ORACLE.rstrip()
    + f"""
QUALIFY valid_from_us <= {ASOF_US}
    AND (valid_to_us IS NULL OR valid_to_us > {ASOF_US})""",
)
def scd2_asof_query(spark, sf_dir):
    """Every user's event_type state as of 2024-01-03T00:00Z, reconstructed
    from the type-2 history (one row per then-active user)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return scd2_asof(scd2_history(ev))
