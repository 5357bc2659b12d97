"""Mann-Kendall trend test per series — the "emerging hot spot" statistic.

The Mann-Kendall S statistic ``S = sum_{i<j} sign(z_j - z_i)`` over a
time-ordered series is the standard nonparametric monotone-trend test;
paired with Gi* hot spots (``operators/autocorr.py``) it is exactly the
"emerging hot-spot analysis" of space-time cubes.  This operator computes
S, the pair count, and the trend verdict per series over the events
table (series = user, value ordered by event time).

Spark-first shape: a WITHIN-SERIES self-equi-join on the series key —
one hash shuffle, never cross-series pairs; per-series work is bounded
by series length squared.  The honest scale boundary, stated: at series
length n the join emits n(n-1)/2 rows, so for very long series (n in
the tens of thousands) the O(n log n) merge-sort Kendall kernel inside
``applyInPandas`` is the right physical plan; for the event-analytics
shape (bounded sessions/users per window) the relational form wins
because it needs no per-group materialization and the oracle can replay
it row-for-row.

Ordering/exactness: pairs are ordered by (ts, event_id) — event_id
breaks timestamp ties deterministically; values are quantized to cents
(``FLOOR(value * 100 + 0.5)``, one IEEE double op identical across
engines), so sign() is exact integer.

Oracle: full generative DuckDB SQL twin over the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def mann_kendall(events: DataFrame) -> DataFrame:
    """(user_id, n_obs, n_pairs, s_stat, trend) per user series."""
    e = events.selectExpr(
        "user_id", "ts", "event_id",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v",
    )
    a = e.selectExpr("user_id", "ts AS ts_a", "event_id AS id_a", "v AS va")
    b = e.selectExpr("user_id", "ts AS ts_b", "event_id AS id_b", "v AS vb")
    pairs = a.join(b, "user_id").where(
        "ts_a < ts_b OR (ts_a = ts_b AND id_a < id_b)"
    )
    stats = pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.signum(F.col("vb") - F.col("va")).cast("long")).alias("s_stat"),
    )
    counts = e.groupBy("user_id").agg(F.count("*").alias("n_obs"))
    return counts.join(stats, "user_id", "left").selectExpr(
        "user_id",
        "n_obs",
        "coalesce(n_pairs, 0) AS n_pairs",
        "coalesce(s_stat, 0) AS s_stat",
        # normalized-score verdict: |S| > 2 * sqrt(var0) with
        # var0 = n(n-1)(2n+5)/18 (no-ties approximation), evaluated by
        # exact integer cross-multiplication: S^2 * 18 > 4 * n(n-1)(2n+5)
        "CASE WHEN coalesce(s_stat, 0) * coalesce(s_stat, 0) * 18"
        "       > 4 * n_obs * (n_obs - 1) * (2 * n_obs + 5)"
        "     THEN CASE WHEN s_stat > 0 THEN 'increasing'"
        "               ELSE 'decreasing' END"
        "     ELSE 'no_trend' END AS trend",
    )


_MK_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
  FROM events),
pairs AS (
  SELECT a.user_id,
         CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sgn
  FROM e a JOIN e b ON a.user_id = b.user_id
   AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))),
stats AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(sgn) AS BIGINT) AS s_stat
  FROM pairs GROUP BY user_id),
counts AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs FROM e GROUP BY user_id)
SELECT c.user_id AS user_id, c.n_obs AS n_obs,
       COALESCE(s.n_pairs, 0) AS n_pairs,
       COALESCE(s.s_stat, 0) AS s_stat,
       CASE WHEN COALESCE(s.s_stat, 0) * COALESCE(s.s_stat, 0) * 18
              > 4 * c.n_obs * (c.n_obs - 1) * (2 * c.n_obs + 5)
            THEN CASE WHEN s.s_stat > 0 THEN 'increasing'
                      ELSE 'decreasing' END
            ELSE 'no_trend' END AS trend
FROM counts c LEFT JOIN stats s ON c.user_id = s.user_id"""


@register("mann_kendall_trend", _MK_ORACLE)
def mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Mann-Kendall monotone-trend statistics over the events
    table — the temporal half of emerging-hot-spot analysis."""
    return mann_kendall(load_table(spark, sf_dir, "events"))
