"""Trajectory kinematics: jump detection semantics + oracle parity."""

import datetime

import duckdb
import pandas as pd

from data_model_spark.operators.kinematics import VMAX_Q, user_kinematics
from data_model_spark.operators.registry import QUERIES


def _ev(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    return spark.createDataFrame(pdf)


def _ts(us):
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)


def test_slow_walk_no_jumps(spark):
    # event ids 0 and 21: both have dlon = -10, dlat = -10 (21 | 21*k),
    # one hour apart -> displacement 10 milli-deg over 3.6e9 us
    rows = [(0, _ts(0), 1), (21, _ts(3_600_000_000), 1)]
    r = user_kinematics(_ev(spark, rows)).collect()[0]
    assert r.n_segs == 1 and r.n_jumps == 0
    # speed = 10 / 3.6e9 * 1e12 = 2777.78 -> 2778 quantized
    assert r.max_speed_q == 2778


def test_teleport_flagged(spark):
    # same displacement in one microsecond: speed_q = 10e12 >> VMAX_Q
    rows = [(0, _ts(0), 1), (21, _ts(1), 1)]
    r = user_kinematics(_ev(spark, rows)).collect()[0]
    assert r.n_segs == 1 and r.n_jumps == 1
    assert r.max_speed_q == 10_000_000_000_000 > VMAX_Q


def test_zero_dt_segment_dropped(spark):
    rows = [(0, _ts(5), 1), (1, _ts(5), 1), (2, _ts(10), 1)]
    r = user_kinematics(_ev(spark, rows)).collect()[0]
    assert r.n_segs == 1  # only the 5->10 segment survives


def test_oracle_parity_small_sf(spark):
    sf = "/root/testdata/sf0.001"
    for name in ("traj_kinematics", "spacetime_cube"):
        sdf = QUERIES[name].spark_fn(spark, sf).toPandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        odf = con.execute(QUERIES[name].oracle).df()
        cols = sorted(sdf.columns)
        s = sorted(map(tuple, sdf[cols].to_numpy().tolist()))
        o = sorted(map(tuple, odf[cols].to_numpy().tolist()))
        assert len(s) > 10, name
        assert s == o, name
