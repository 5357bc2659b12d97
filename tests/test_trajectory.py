"""Douglas-Peucker: recursive reference, invariants, determinism."""

import numpy as np
import pytest

from data_model_spark.operators.trajectory import dp_mask, simplify_trajectories


def _dp_recursive(x, y, tol):
    """Textbook recursive DP with the same integer-exact comparison."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    tol2 = tol * tol

    def rec(a, b):
        if b - a < 2:
            return
        dx, dy = int(x[b] - x[a]), int(y[b] - y[a])
        len2 = dx * dx + dy * dy
        best, best_num, thresh = -1, -1, tol2 * max(len2, 1)
        for i in range(a + 1, b):
            if len2 == 0:
                num = (int(x[i] - x[a])) ** 2 + (int(y[i] - y[a])) ** 2
                th = tol2
            else:
                c = dx * int(y[i] - y[a]) - dy * int(x[i] - x[a])
                num, th = c * c, tol2 * len2
            thresh = th
            if num > best_num:
                best, best_num = i, num
        if best_num > thresh:
            keep[best] = True
            rec(a, best)
            rec(best, b)

    if n > 2:
        rec(0, n - 1)
    return keep


def _walk(seed, n):
    xs = np.cumsum([(seed + i) * 37 % 21 - 10 for i in range(n)]).astype(np.int64)
    ys = np.cumsum([(seed + i) * 91 % 21 - 10 for i in range(n)]).astype(np.int64)
    return xs, ys


def test_mask_matches_recursive_reference():
    for seed in range(5):
        x, y = _walk(seed, 120)
        for tol in (5, 15, 40):
            assert (dp_mask(x, y, tol) == _dp_recursive(x, y, tol)).all()


def test_within_tolerance_invariant():
    x, y = _walk(3, 200)
    tol = 20
    keep = dp_mask(x, y, tol)
    kept_idx = np.flatnonzero(keep)
    # every dropped point is within tol of its enclosing kept segment
    for a, b in zip(kept_idx[:-1], kept_idx[1:]):
        dx, dy = int(x[b] - x[a]), int(y[b] - y[a])
        len2 = dx * dx + dy * dy
        for i in range(a + 1, b):
            if len2 == 0:
                assert (x[i] - x[a]) ** 2 + (y[i] - y[a]) ** 2 <= tol * tol
            else:
                c = dx * int(y[i] - y[a]) - dy * int(x[i] - x[a])
                assert c * c <= tol * tol * len2


def test_degenerate_tracks():
    assert dp_mask(np.array([], np.int64), np.array([], np.int64), 5).size == 0
    one = dp_mask(np.array([3], np.int64), np.array([4], np.int64), 5)
    assert one.tolist() == [True]
    two = dp_mask(np.array([0, 9], np.int64), np.array([0, 0], np.int64), 5)
    assert two.tolist() == [True, True]
    # straight line collapses to endpoints
    line = dp_mask(np.arange(50, dtype=np.int64), np.zeros(50, np.int64), 1)
    assert line.sum() == 2
    # closed loop (chord length 0) keeps its far excursion
    x = np.array([0, 10, 0], np.int64)
    y = np.array([0, 0, 0], np.int64)
    assert dp_mask(x, y, 3).tolist() == [True, True, True]


def test_spark_matches_local_and_parallelism(spark):
    rows = []
    for u in range(6):
        x, y = _walk(u, 150)
        rows += [(u, i + 1, int(a), int(b)) for i, (a, b) in enumerate(zip(x, y))]
    df = spark.createDataFrame(rows, "user_id long, seq long, x long, y long")
    tol = 15
    out1 = simplify_trajectories(df.coalesce(1), tol).toPandas()
    out32 = simplify_trajectories(df.repartition(32), tol).toPandas()
    k = lambda p: {tuple(r) for r in p.itertuples(index=False)}
    assert k(out1) == k(out32)
    for u in range(6):
        x, y = _walk(u, 150)
        want = {
            (u, i + 1, int(x[i]), int(y[i]))
            for i in np.flatnonzero(dp_mask(x, y, tol))
        }
        assert {t for t in k(out1) if t[0] == u} == want


def test_span_overflow_guard():
    x = np.array([0, 10**6, 0], np.int64)
    y = np.array([0, 1, 2], np.int64)
    with pytest.raises(ValueError, match="span"):
        dp_mask(x, y, 5)


# ---------------------------------------------------------------------------
# stay points
# ---------------------------------------------------------------------------


def _stay_reference(xs, ys, ts, sq, d2, min_dur):
    """Pure-Python Li et al. anchor scan."""
    n, i, out = len(xs), 0, []
    while i < n - 1:
        j = i
        for k in range(i + 1, n):
            if (xs[k] - xs[i]) ** 2 + (ys[k] - ys[i]) ** 2 > d2:
                break
            j = k
        if j > i and ts[j] - ts[i] >= min_dur:
            out.append(
                (int(sq[i]), int(sq[j]), j - i + 1,
                 int(sum(xs[i : j + 1])), int(sum(ys[i : j + 1])),
                 int(ts[j] - ts[i]))
            )
            i = j + 1
        else:
            i += 1
    return out


def test_stay_points_match_reference_scan(spark):
    from data_model_spark.operators.trajectory import stay_points

    rows = []
    truth = {}
    for u in range(5):
        x, y = _walk(u, 120)
        ts = [i * 3_600_000_000 + (u + i) % 7 * 60_000_000 for i in range(120)]
        sq = list(range(1, 121))
        rows += [(u, sq[i], ts[i], int(x[i]), int(y[i])) for i in range(120)]
        truth[u] = _stay_reference(
            [int(v) for v in x], [int(v) for v in y], ts, sq, 625, 2 * 3_600_000_000
        )
    df = spark.createDataFrame(rows, "user_id long, seq long, ts_us long, x long, y long")
    got = stay_points(df.repartition(16), 625, 2 * 3_600_000_000).collect()
    by_u = {}
    for r in got:
        by_u.setdefault(r.user_id, []).append(
            (r.start_seq, r.end_seq, r.n_fixes, r.x_sum, r.y_sum, r.dur_us)
        )
    for u in range(5):
        assert sorted(by_u.get(u, [])) == sorted(truth[u]), u
    assert any(truth.values())  # fixture yields real stays


def test_stay_points_handbuilt(spark):
    from data_model_spark.operators.trajectory import stay_points

    h = 3_600_000_000
    rows = [
        (1, 1, 0 * h, 0, 0),
        (1, 2, 1 * h, 3, 4),    # within d=10 of anchor
        (1, 3, 2 * h, 6, 0),    # still within
        (1, 4, 3 * h, 50, 50),  # violator -> stay (1..3), dur 2h
        (1, 5, 4 * h, 52, 51),  # within of new anchor but dur 1h < 2h
        (1, 6, 5 * h, 99, 99),
    ]
    df = spark.createDataFrame(rows, "user_id long, seq long, ts_us long, x long, y long")
    got = [tuple(r) for r in stay_points(df, 100, 2 * h).collect()]
    assert got == [(1, 1, 3, 3, 9, 4, 2 * h)]
