"""Funnel tests: randomized reference-scan equality (greedy earliest-
first-touch), strict-order semantics, chain-break NULLs, repeated
steps, and parallelism determinism."""

import numpy as np

from data_model_spark.operators.funnel import funnel_times

STEPS = ["a", "b", "c"]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts_us long"
    )


def _ref(rows, steps):
    """Sequential truth: earliest in-order chain per user."""
    out = {}
    by_u = {}
    for u, et, t in rows:
        by_u.setdefault(u, []).append((t, et))
    for u, evs in by_u.items():
        evs.sort()
        times, cur = [], -1
        for step in steps:
            nxt = min((t for t, et in evs if et == step and t > cur), default=None)
            times.append(nxt)
            if nxt is None:
                break
            cur = nxt
        times += [None] * (len(steps) - len(times))
        out[u] = (*times, sum(t is not None for t in times))
    return out


def _collect(spark, rows):
    return {
        r.user_id: (r.t1, r.t2, r.t3, r.depth)
        for r in funnel_times(_df(spark, rows), STEPS).collect()
    }


def test_matches_reference_random(spark):
    rng = np.random.default_rng(13)
    rows = [
        (int(u), str(rng.choice(["a", "b", "c", "x"])), int(rng.integers(0, 1000)))
        for u in range(25)
        for _ in range(rng.integers(1, 15))
    ]
    assert _collect(spark, rows) == _ref(rows, STEPS)


def test_strict_order_required(spark):
    # b happens BEFORE a -> depth 1 (only a counts)
    rows = [(1, "b", 5), (1, "a", 10)]
    assert _collect(spark, rows)[1] == (10, None, None, 1)
    # simultaneous does not count (strictly after)
    rows = [(2, "a", 10), (2, "b", 10)]
    assert _collect(spark, rows)[2] == (10, None, None, 1)


def test_earliest_chain_chosen(spark):
    # two possible chains; the earliest in-order one wins at each step
    rows = [(1, "a", 1), (1, "a", 50), (1, "b", 10), (1, "c", 20)]
    assert _collect(spark, rows)[1] == (1, 10, 20, 3)


def test_user_without_any_steps(spark):
    rows = [(1, "x", 3)]
    assert _collect(spark, rows)[1] == (None, None, None, 0)


def test_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(4)
    rows = [
        (int(u), str(rng.choice(["a", "b", "c"])), int(rng.integers(0, 500)))
        for u in range(40)
        for _ in range(10)
    ]
    df = _df(spark, rows)
    a = sorted(map(tuple, funnel_times(df.repartition(1), STEPS).collect()))
    b = sorted(map(tuple, funnel_times(df.repartition(15), STEPS).collect()))
    assert a == b and len(a) == 40
