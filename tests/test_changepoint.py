"""CUSUM changepoint: planted-shift recovery + integer invariants."""

from pyspark.sql import functions as F

from data_model_spark.operators.changepoint import cusum_changepoints


def test_recovers_planted_mean_shift(spark):
    # stream of 200: first 120 at 10.00, last 80 at 20.00 -> cp at t=120
    rows = [("s", i, 10.0 if i < 120 else 20.0) for i in range(200)]
    # a control stream with no shift: cp statistic should be much smaller
    rows += [("flat", i, 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    out = {r.key: r for r in cusum_changepoints(df).collect()}
    assert out["s"].cp_idx == 120
    assert abs(out["s"].ns_at_cp) > 0
    assert out["flat"].ns_at_cp == 0  # constant stream: S_t == 0 everywhere
    assert out["flat"].cp_idx == 1  # earliest-t tie-break


def test_parallelism_invariant(spark, sf_dir):
    from data_model_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    a = sorted(map(tuple, cusum_changepoints(ev.repartition(1)).collect()))
    b = sorted(map(tuple, cusum_changepoints(ev.repartition(11)).collect()))
    assert a == b and len(a) > 0
