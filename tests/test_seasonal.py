"""Seasonal decomposition: planted-seasonality golden."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from data_model_spark.operators.seasonal import PERIOD, seasonal_profile


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "value"])
    return spark.createDataFrame(pdf).select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value"
    )


def test_pure_seasonal_recovered(spark):
    # value = phase bump on a flat base: the detrended per-phase means
    # must recover the bump shape (up to the shared window mean)
    t0 = dt.datetime(2024, 1, 1)
    bump = [0.00, 0.07, 0.14, 0.00, 0.00, 0.00, 0.00]
    rows = [
        (1, t0 + dt.timedelta(hours=i), i, 1.00 + bump[i % PERIOD])
        for i in range(4 * PERIOD)
    ]
    out = {
        r.phase: r.seas_micro for r in seasonal_profile(_events(spark, rows)).collect()
    }
    assert len(out) == PERIOD
    # bump mean = 3 cents; phases 1/2 sit above it, the rest below
    assert out[2] > out[1] > 0 > out[0]
    assert out[0] == out[3] == out[4]
    # index differences reproduce the planted bump differences (micro
    # units of cents): 7 - 0 = 7 cents between phase 1 and phase 0
    assert out[1] - out[0] == 7_000_000
    assert out[2] - out[0] == 14_000_000


def test_constant_series_zero_index(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(9, t0 + dt.timedelta(hours=i), i, 5.0) for i in range(3 * PERIOD)]
    out = seasonal_profile(_events(spark, rows)).collect()
    assert all(r.seas_micro == 0 for r in out)


def test_edges_excluded(spark):
    # a series of exactly one period: only the center row has a full
    # window -> one phase row survives
    t0 = dt.datetime(2024, 1, 1)
    rows = [(4, t0 + dt.timedelta(hours=i), i, float(i)) for i in range(PERIOD)]
    out = seasonal_profile(_events(spark, rows)).collect()
    assert len(out) == 1
    assert out[0].phase == PERIOD // 2
