"""Sessionization: batch window formulation + streaming session_window twin."""

import datetime as dt

from pyspark.sql import functions as F

from data_model_spark.operators.sessions import GAP_MINUTES, sessionize
from data_model_spark.streaming.sessions import streaming_sessions

EVENTS = "/root/testdata/sf0.001/events.parquet"


def mk_events(spark, rows):
    """rows: (event_id, user_id, minutes_offset, value)"""
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(minutes=m), uid, "t", v, "{}")
        for eid, uid, m, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_gap_rule_boundary_and_splits(spark):
    gap = 30
    df = mk_events(
        spark,
        [
            (0, 1, 0.0, 1.0),
            (1, 1, 30.0, 1.0),   # diff == gap: SAME session (session_window
            #                      merges touching windows — pinned below)
            (2, 1, 61.0, 1.0),   # diff = 31 min > gap: new session
            (3, 2, 0.0, 1.0),    # other user: independent
        ],
    )
    got = {
        (r["user_id"], r["session_idx"]): r["n_events"]
        for r in sessionize(df, gap_minutes=gap).collect()
    }
    assert got == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_session_bounds_and_sums(spark):
    df = mk_events(spark, [(0, 5, 0.0, 1.5), (1, 5, 10.0, 2.25)])
    r = sessionize(df, gap_minutes=30).collect()[0]
    assert r["n_events"] == 2
    assert r["t_end_us"] - r["t_start_us"] == 10 * 60 * 1_000_000
    assert r["sum_value"] == 3.75


def test_streaming_sessions_equal_batch(spark):
    batch = (
        sessionize(spark.read.parquet(EVENTS), gap_minutes=GAP_MINUTES)
        .select("user_id", "t_start_us", "n_events", "sum_value")
    )
    stream = streaming_sessions(spark, EVENTS, gap_minutes=GAP_MINUTES)
    b = sorted(map(tuple, batch.collect()))
    s = sorted(map(tuple, stream.collect()))
    assert b == s and len(b) > 100


def test_streaming_boundary_matches_batch_rule(spark, tmp_path):
    """An event exactly `gap` after its predecessor: Spark's session_window
    MERGES touching windows (measured, not assumed), so the batch rule is
    `diff > gap` and both engines must report ONE 3-event session here.
    This also exercises the directory-shaped (Spark-written) parquet
    staging path of the drain harness."""
    gap = 30
    df = mk_events(
        spark,
        [(0, 1, 0.0, 1.0), (1, 1, 30.0, 2.0), (2, 1, 45.0, 4.0)],
    )
    pq = str(tmp_path / "boundary_events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    batch = sorted(
        (r["user_id"], r["t_start_us"], r["n_events"], r["sum_value"])
        for r in sessionize(spark.read.parquet(pq), gap_minutes=gap).collect()
    )
    stream = sorted(map(tuple, streaming_sessions(spark, pq, gap_minutes=gap).collect()))
    assert batch == stream
    assert [b[2] for b in batch] == [3]  # one merged 3-event session


def test_cohort_retention_pre_epoch_floor_semantics(spark):
    """Negative epoch micros: week bucket must FLOOR (match the oracle),
    not truncate toward zero."""
    from data_model_spark.operators.sessions import WEEK_US, cohort_retention

    df = mk_events(
        spark,
        [(0, 1, 0.0, 1.0), (1, 1, 7 * 24 * 60.0, 1.0)],
    ).withColumn("ts", F.expr("ts - INTERVAL 60 YEARS"))  # well before 1970
    rows = {(r["cohort_wk"], r["week_offset"]): r["n_users"]
            for r in cohort_retention(df).collect()}
    import datetime as dt

    # expected buckets via Python's true floor division on exact micros
    # (INTERVAL 60 YEARS from 2024-01-01 lands on 1964-01-01)
    epoch = dt.datetime(1970, 1, 1)
    us0 = int((dt.datetime(1964, 1, 1) - epoch).total_seconds() * 1e6)
    wk0 = us0 // WEEK_US
    wk1 = (us0 + 7 * 86400 * 1_000_000) // WEEK_US
    assert wk0 < 0  # genuinely pre-epoch
    assert rows == {(wk0, 0): 1, (wk0, wk1 - wk0): 1}


def test_streaming_multipart_input_equals_batch(spark, tmp_path):
    """Directory-shaped input with SEVERAL part files, each spanning the
    full time range (how Spark writes): all parts must land in one
    micro-batch, or the first part's watermark would discard later parts'
    older rows as late data."""
    gap = 30
    rows = [(i, 1 + (i % 3), float(i * 7), 1.0) for i in range(60)]
    df = mk_events(spark, rows)
    pq = str(tmp_path / "multipart_events.parquet")
    df.repartition(4).write.mode("overwrite").parquet(pq)
    import glob

    assert len(glob.glob(pq + "/part-*.parquet")) > 1
    batch = sorted(
        (r["user_id"], r["t_start_us"], r["n_events"], r["sum_value"])
        for r in sessionize(spark.read.parquet(pq), gap_minutes=gap).collect()
    )
    stream = sorted(map(tuple, streaming_sessions(spark, pq, gap_minutes=gap).collect()))
    assert batch == stream


def test_streaming_sessions_empty_input(spark, tmp_path):
    df = mk_events(spark, [])
    pq = str(tmp_path / "empty_events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(pq)
    assert streaming_sessions(spark, pq).count() == 0
