"""SCD2 tests: hand-built history golden (runs, reopenings, ties),
interval-partition invariants on the real stream, parallelism."""

from data_model_spark.operators.scd import scd2_history
from data_model_spark.sources.tables import load_table
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, event_id long, ts_us long")


def test_hand_golden_runs_and_reopen(spark):
    rows = [
        (1, "a", 1, 100),
        (1, "a", 2, 200),   # same state -> compressed away
        (1, "b", 3, 300),
        (1, "a", 4, 400),   # reopened 'a' is a NEW version row
        (2, "x", 5, 50),
    ]
    got = sorted(map(tuple, scd2_history(_ev(spark, rows)).collect()))
    assert got == sorted([
        (1, "a", 100, 300, False),
        (1, "b", 300, 400, False),
        (1, "a", 400, None, True),
        (2, "x", 50, None, True),
    ])


def test_equal_ts_breaks_on_event_id(spark):
    rows = [(1, "a", 2, 100), (1, "b", 1, 100)]  # b first by event_id
    got = sorted(map(tuple, scd2_history(_ev(spark, rows)).collect()))
    assert got == sorted([(1, "b", 100, 100, False), (1, "a", 100, None, True)])


def test_history_partitions_time(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    hist = scd2_history(ev).collect()
    by_user = {}
    for r in hist:
        by_user.setdefault(r.user_id, []).append(r)
    n_current = 0
    for rows in by_user.values():
        rows.sort(key=lambda r: r.valid_from_us)
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to_us == b.valid_from_us  # gapless chain
            assert a.event_type != b.event_type      # compressed
            assert not a.is_current
        assert rows[-1].is_current and rows[-1].valid_to_us is None
        n_current += 1
    assert n_current == len(by_user) >= 10


def test_deterministic_across_parallelism(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"))
    a = sorted(map(tuple, scd2_history(ev.repartition(1)).collect()))
    b = sorted(map(tuple, scd2_history(ev.repartition(13)).collect()))
    assert a == b
