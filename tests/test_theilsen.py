"""Theil-Sen: hand-computed golden + outlier robustness."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from data_model_spark.operators.theilsen import theil_sen


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    return spark.createDataFrame(pdf).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )


def test_linear_series_recovers_slope(spark):
    # v = 2 cents/second exactly: every pairwise slope is 2.0
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(seconds=s), 0.02 * s) for s in range(6)
    ]
    out = theil_sen(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].n_slopes == 15
    assert out[0].slope_micro == 2_000_000


def test_outlier_robust_median(spark):
    # 5 collinear points (slope 1 cent/s) + one wild outlier: the median
    # pairwise slope stays at 1.0 (the Theil-Sen breakdown property)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(7, t0 + dt.timedelta(seconds=s), 0.01 * s) for s in range(5)]
    rows.append((7, t0 + dt.timedelta(seconds=5), 99.0))
    out = theil_sen(_events(spark, rows)).collect()
    assert out[0].n_slopes == 15
    assert out[0].slope_micro == 1_000_000


def test_lower_median_even_count(spark):
    # two points -> one slope; four points with distinct slopes -> the
    # lower median (rank n/2) is picked, no averaging
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (3, t0 + dt.timedelta(seconds=0), 0.00),
        (3, t0 + dt.timedelta(seconds=1), 0.01),
    ]
    out = theil_sen(_events(spark, rows)).collect()
    assert out[0].n_slopes == 1 and out[0].slope_micro == 1_000_000
