"""Mann-Kendall: exact S vs direct computation; verdict rule; ties."""

import numpy as np

from data_model_spark.operators.mannkendall import mann_kendall
from data_model_spark.sources.tables import load_table, local_df


def _direct_s(vals):
    s = 0
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            s += int(np.sign(vals[j] - vals[i]))
    return s


def test_matches_direct_per_user(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {r.user_id: r for r in mann_kendall(ev).collect()}
    by_user = {}
    for r in ev.collect():
        by_user.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, int(np.floor(r.value * 100 + 0.5)))
        )
    assert set(got) == set(by_user)
    for uid, rows in by_user.items():
        rows.sort()
        vals = [v for _, _, v in rows]
        n = len(vals)
        assert got[uid].n_obs == n
        assert got[uid].n_pairs == n * (n - 1) // 2
        assert got[uid].s_stat == _direct_s(vals)


def _series(spark, vals):
    rows = [(i, f"2024-01-{i + 1:02d} 00:00:00", 7, "x", float(v), "{}")
            for i, v in enumerate(vals)]
    df = local_df(
        spark, rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    )
    return df.selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props"
    )


def test_monotone_series_verdicts(spark):
    inc = mann_kendall(_series(spark, range(1, 13))).collect()[0]
    assert inc.s_stat == 66 and inc.trend == "increasing"
    dec = mann_kendall(_series(spark, range(12, 0, -1))).collect()[0]
    assert dec.s_stat == -66 and dec.trend == "decreasing"
    flat = mann_kendall(_series(spark, [5] * 12)).collect()[0]
    assert flat.s_stat == 0 and flat.trend == "no_trend"


def test_verdict_threshold_is_exact_cross_multiplication(spark):
    # n = 12: var0 = 12*11*29/18; |S| must EXCEED 2*sqrt(var0) ~ 29.16;
    # S = 30 trips the integer rule (900*18 > 4*12*11*29 = 15312), S = 29
    # does not (841 * 18 = 15138 < 15312)
    assert 30 * 30 * 18 > 4 * 12 * 11 * 29
    assert 29 * 29 * 18 < 4 * 12 * 11 * 29


def test_single_observation_user(spark):
    out = mann_kendall(_series(spark, [42])).collect()[0]
    assert (out.n_obs, out.n_pairs, out.s_stat, out.trend) == (
        1, 0, 0, "no_trend"
    )
