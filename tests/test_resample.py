"""Trajectory time-resampling: grid semantics, lerp exactness, oracle parity."""

import datetime

import duckdb
import numpy as np
import pandas as pd

from data_model_spark.operators.resample import (
    GRID_US,
    resample_trajectories,
    traj_resample,
)
from data_model_spark.operators.registry import QUERIES


def _ev_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    return spark.createDataFrame(pdf)


def _ts(us: int) -> datetime.datetime:
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)


def test_grid_instants_half_open(spark):
    g = GRID_US
    # one user, fixes at 0.5g and 2.0g: grid instants in (0.5g, 2g] = {g, 2g}
    ev = _ev_df(spark, [(0, _ts(g // 2), 1), (1, _ts(2 * g), 1)])
    out = resample_trajectories(ev).collect()
    assert sorted(r.tg for r in out) == [g, 2 * g]


def test_on_grid_start_excluded(spark):
    g = GRID_US
    # t0 exactly on the grid: the instant at t0 belongs to the PREVIOUS
    # interval; this pair emits only 2g
    ev = _ev_df(spark, [(0, _ts(g), 1), (1, _ts(2 * g), 1)])
    out = resample_trajectories(ev).collect()
    assert [r.tg for r in out] == [2 * g]


def test_no_grid_instant_in_short_gap(spark):
    g = GRID_US
    ev = _ev_df(spark, [(0, _ts(g + 5), 1), (1, _ts(g + 10), 1)])
    assert resample_trajectories(ev).count() == 0


def test_lerp_midpoint_exact(spark):
    g = GRID_US
    # fixes at g/2 and 3g/2: the instant g is the exact midpoint, so the
    # lerped position is the average of the endpoint positions
    ev = _ev_df(spark, [(0, _ts(g // 2), 1), (1, _ts(g + g // 2), 1)])
    row = resample_trajectories(ev).collect()[0]
    # walk: event 0 -> dlon=-10, dlat=-10; event 1 -> dlon=+7, dlat=+0
    # (1*37%21=16-10=7 ... verify numerically instead of by hand)
    d0lon, d0lat = 0 * 37 % 21 - 10, 0 * 91 % 21 - 10
    d1lon, d1lat = 1 * 37 % 21 - 10, 1 * 91 % 21 - 10
    lon0, lat0 = 10.0 + d0lon / 1000.0, 46.0 + d0lat / 1000.0
    lon1 = 10.0 + (d0lon + d1lon) / 1000.0
    lat1 = 46.0 + (d0lat + d1lat) / 1000.0
    fr = 0.5
    assert row.qx == int(np.floor((lon0 + (lon1 - lon0) * fr) * 1e6 + 0.5))
    assert row.qy == int(np.floor((lat0 + (lat1 - lat0) * fr) * 1e6 + 0.5))


def test_oracle_parity_small_sf(spark):
    sf = "/root/testdata/sf0.001"
    sdf = traj_resample(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    odf = con.execute(QUERIES["traj_resample"].oracle).df()
    key = ["user_id", "tg", "qx", "qy"]
    s = sorted(map(tuple, sdf[key].to_numpy().tolist()))
    o = sorted(map(tuple, odf[key].to_numpy().tolist()))
    assert len(s) > 1000
    assert s == o
