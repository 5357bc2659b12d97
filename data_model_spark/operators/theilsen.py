"""Theil-Sen slope estimator per series — Mann-Kendall's companion.

Where `mannkendall.py` answers *is there* a monotone trend, Theil-Sen
answers *how steep*: the median of all pairwise slopes
``(v_j - v_i) / (t_j - t_i)`` over a time series — the standard robust
trend magnitude in EO change analysis (NDVI greening/browning rates,
subsidence velocities), with a 29.3% breakdown point against outliers
(Sen 1968; the same pairing the emerging-hot-spot toolchain reports
next to the MK verdict).

Spark-first shape: one ``collect_list`` aggregation per series (a
single hash shuffle of the EVENT rows, n per series), then the whole
pair enumeration + median inside a vectorized Arrow ``pandas_udf`` —
the per-group-kernel plan this docstring used to only *recommend* for
long series.  The original window formulation (self-equi-join to
n(n-1)/2 pair ROWS, then ``row_number`` over a per-series sort) kept
the identical shuffle key but paid the pair explosion in the exchange
and sort: 171M materialized pair rows for the 24k x 120 bench fixture
vs 2.88M event rows here — measured 13.4 s -> 2.2 s warm at local[8],
and the 2->8 scaling efficiency of the probe rose with it (the pair
sort was the non-scaling stage).  The n(n-1)/2 slope buffer still
exists, but per group in NumPy inside one worker, never in a shuffle.
The SQL window twin remains below as the oracle.

Exactness: values quantize to integer cents, timestamps to integer
epoch seconds (only DIFFERENCES are used, so any engine-constant epoch
offset cancels); each slope is one IEEE division of exact integers —
bit-identical across engines — and the LOWER median (element at
row_number ceil(n/2)) avoids the even-count averaging halfway case.
Slopes transport as HALF-UP micro-units.  Oracle: full generative
DuckDB SQL twin with the identical window.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from pyspark.sql.types import LongType, StructField, StructType

from ..sources.tables import load_table
from .registry import register

# explicit StructType (not a DDL string): the decorator must not need an
# active SparkContext at import time
_TS_OUT = StructType(
    [StructField("n_slopes", LongType()), StructField("slope_micro", LongType())]
)


@pandas_udf(_TS_OUT)
def _ts_kernel(ts_arr: pd.Series, vs_arr: pd.Series) -> pd.DataFrame:
    """Per-series lower-median of pairwise slopes, bit-identical to the
    SQL window twin: each slope is ONE IEEE division of exact int64s
    (vb - va) / (tb - ta); pairs with equal timestamps are excluded
    exactly as the ``ta < tb`` join predicate excludes them; the kept
    element is the one ``row_number`` ceil(n/2) keeps after an
    ascending sort (ties carry equal doubles — position among equals
    does not change the value); micro-units are HALF-UP via
    floor(x * 1e6 + 0.5) in double, the same expression Spark and
    DuckDB evaluate."""
    n_out = np.full(len(ts_arr), -1, dtype=np.int64)
    med_out = np.zeros(len(ts_arr), dtype=np.int64)
    for row, (ts, vs) in enumerate(zip(ts_arr, vs_arr)):
        t = np.asarray(ts, dtype=np.int64)
        v = np.asarray(vs, dtype=np.int64)
        i, j = np.triu_indices(len(t), k=1)
        keep = t[j] > t[i]  # strict-time pairs only (dup-ts pairs drop)
        i, j = i[keep], j[keep]
        n = len(i)
        if n == 0:
            continue  # no valid pair: series absent from output
        slopes = (v[j] - v[i]).astype(np.float64) / (t[j] - t[i]).astype(
            np.float64
        )
        slopes.sort()
        med = slopes[(n + (n % 2)) // 2 - 1]  # lower median
        n_out[row] = n
        med_out[row] = np.int64(np.floor(med * 1e6 + 0.5))
    return pd.DataFrame({"n_slopes": n_out, "slope_micro": med_out})


def theil_sen(events: DataFrame) -> DataFrame:
    """(user_id, n_slopes, slope_micro) per user series."""
    e = events.selectExpr(
        "user_id",
        "CAST(unix_timestamp(ts) AS BIGINT) AS t",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v",
    )
    # one shuffle of EVENT rows (n per series, not n^2 pair rows); the
    # time-sort happens inside sort_array, JVM-side
    series = e.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("t", "v"))).alias("pts")
    )
    out = series.select(
        "user_id",
        _ts_kernel(F.col("pts.t"), F.col("pts.v")).alias("o"),
    )
    return out.where("o.n_slopes >= 0").selectExpr(
        "user_id", "o.n_slopes AS n_slopes", "o.slope_micro AS slope_micro"
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
