"""Ordered funnel analysis (multi-step conversion attribution).

The canonical product-analytics query: for each user, the earliest
chain of step events in ORDER — step k counts only if it happens
strictly after the user's step k-1 time (first-touch semantics).  The
sequential scan formulation is per-user state; the distributed
formulation is k chained conditional-min aggregations, each ONE
user-keyed shuffle:

    t_1(u) = min ts of step-1 events
    t_k(u) = min ts of step-k events with ts > t_{k-1}(u)

which is exactly the standard funnel SQL and therefore replayable in
the oracle verbatim.

Determinism contract: timestamps are int64 microseconds and every
reduction is ``min`` — commutative, exact, plan-independent.  Earliest-
first-touch is a greedy choice that is OPTIMAL for reachability (an
exchange argument: taking the earliest step-k time never excludes a
later completion), pinned by the randomized reference scan in
tests/test_funnel.py.

Scale shape: k small (funnels are 3-7 steps); each stage filters to one
event type BEFORE the shuffle (map-side predicate + partial min), joins
against the user-sized previous-step frame (broadcastable while the
funnel narrows — it only shrinks), and aggregates combinably.  10^12
events across 10^9 users parallelize on the user key; no windows, no
sorts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def funnel_times(
    events: DataFrame,
    steps: list[str],
    user: str = "user_id",
    etype: str = "event_type",
    ts: str = "ts_us",
) -> DataFrame:
    """(user, t1..tk, depth): earliest in-order completion time of each
    funnel prefix (NULL once the chain breaks), and the number of steps
    reached."""
    ev = events.select(
        F.col(user).alias("u"), F.col(etype).alias("et"), F.col(ts).alias("t")
    )
    users = ev.select("u").distinct()
    out = users
    prev = None
    for i, name in enumerate(steps):
        stage = ev.filter(F.col("et") == name)
        if prev is not None:
            stage = stage.join(
                out.select("u", prev).filter(F.col(prev).isNotNull()), "u"
            ).filter(F.col("t") > F.col(prev))
        col = f"t{i + 1}"
        agg = stage.groupBy("u").agg(F.min("t").alias(col))
        out = out.join(agg, "u", "left")
        prev = col
    depth = reduce(
        lambda acc, i: acc + F.when(F.col(f"t{i + 1}").isNotNull(), 1).otherwise(0),
        range(len(steps)),
        F.lit(0),
    )
    return out.select(
        F.col("u").alias(user),
        *[f"t{i + 1}" for i in range(len(steps))],
        depth.alias("depth"),
    )


_FUNNEL_ORACLE = """
WITH ev AS (
  SELECT user_id AS u, event_type AS et, epoch_us(ts) AS t FROM events),
users AS (SELECT DISTINCT u FROM ev),
s1 AS (SELECT u, MIN(t) AS t1 FROM ev WHERE et = 'view' GROUP BY u),
s2 AS (SELECT e.u, MIN(e.t) AS t2 FROM ev e JOIN s1 ON s1.u = e.u
       WHERE e.et = 'click' AND e.t > s1.t1 GROUP BY e.u),
s3 AS (SELECT e.u, MIN(e.t) AS t3 FROM ev e JOIN s2 ON s2.u = e.u
       WHERE e.et = 'purchase' AND e.t > s2.t2 GROUP BY e.u)
SELECT users.u AS user_id, s1.t1, s2.t2, s3.t3,
       (CASE WHEN s1.t1 IS NULL THEN 0 ELSE 1 END
        + CASE WHEN s2.t2 IS NULL THEN 0 ELSE 1 END
        + CASE WHEN s3.t3 IS NULL THEN 0 ELSE 1 END) AS depth
FROM users LEFT JOIN s1 ON s1.u = users.u
LEFT JOIN s2 ON s2.u = users.u LEFT JOIN s3 ON s3.u = users.u"""


@register("funnel_depths", _FUNNEL_ORACLE)
def funnel_depths(spark, sf_dir):
    """Per-user view -> click -> purchase funnel: earliest in-order step
    times (int64 micros) and depth reached (150 users at sf0.01);
    bit-exact vs the identical chained-conditional-min SQL."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return funnel_times(ev, ["view", "click", "purchase"])
