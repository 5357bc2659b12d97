"""Adaptive quadtree tiling: partition exactness, rule branches, plan."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.quadtree import (
    QT_MIN,
    QT_N,
    QT_T,
    _pixels,
    quadtree_leaves,
)


def _np_raster():
    x, y = np.meshgrid(np.arange(QT_N), np.arange(QT_N), indexing="ij")
    return np.where(
        (x < 256) & (y < 256), 100,
        np.where(
            (x >= 256) & (y < 256), ((x % 256) // 32) * 120,
            np.where((x < 256), (x * 31 + y * 17) % 64,
                     (x * 1103515245 + y * 12345) % 1024),
        ),
    ).astype(np.int64)


def _np_leaves(v: np.ndarray, threshold: int):
    """Independent top-down replay (recursive, per-node NumPy)."""
    out = []

    def visit(bx, by, k):
        blk = v[bx * k:(bx + 1) * k, by * k:(by + 1) * k]
        n = k * k
        s, ss = int(blk.sum()), int((blk * blk).sum())
        var_num = n * ss - s * s
        if var_num <= threshold * n * n or k == QT_MIN:
            out.append((k, bx, by, n, s, var_num,
                        int(k == QT_MIN and var_num > threshold * n * n)))
            return
        for dx in (0, 1):
            for dy in (0, 1):
                visit(2 * bx + dx, 2 * by + dy, k // 2)

    visit(0, 0, QT_N)
    return set(out)


def test_fixture_pixels_match_numpy(spark):
    got = {
        (r.x, r.y): r.v
        for r in _pixels(spark).filter("x < 8 or x >= 504").collect()
    }
    v = _np_raster()
    for (x, y), val in got.items():
        assert val == v[x, y]


def test_leaves_equal_recursive_replay(spark):
    got = {tuple(r) for r in quadtree_leaves(spark).collect()}
    want = _np_leaves(_np_raster(), QT_T)
    assert got == want
    levels = {r[0] for r in got}
    assert len(levels) >= 3  # non-vacuous: leaves at multiple depths


def test_leaves_partition_canvas_exactly(spark):
    cover = np.zeros((QT_N, QT_N), dtype=np.int64)
    for r in quadtree_leaves(spark).collect():
        k = r.blk
        cover[r.bx * k:(r.bx + 1) * k, r.by * k:(r.by + 1) * k] += 1
    assert (cover == 1).all()


def test_forced_only_at_floor_and_above_threshold(spark):
    for r in quadtree_leaves(spark).collect():
        if r.forced:
            assert r.blk == QT_MIN
            assert r.var_num > QT_T * r.n_px * r.n_px
        elif r.blk != QT_MIN:
            assert r.var_num <= QT_T * r.n_px * r.n_px


def test_child_variance_can_exceed_parent():
    """The reason reachability must cascade: a checkerboard block has
    high variance, but embedding it beside matching-mean blocks can make
    a CHILD's variance exceed its parent's (up to 4x)."""
    child = np.array([[0, 2], [2, 0]], dtype=np.int64)  # var 1
    parent = np.tile([[1]], (4, 4)).astype(np.int64)
    parent[:2, :2] = child  # other three quadrants constant 1 (mean 1)

    def var_num(a):
        n = a.size
        return n * int((a * a).sum()) - int(a.sum()) ** 2

    n_c, n_p = child.size, parent.size
    # population variances: child 1.0, parent 0.25
    assert var_num(child) * n_p * n_p > var_num(parent) * n_c * n_c


def test_distributed_plan_is_pure_jvm(spark, monkeypatch):
    # the scale path (above the single-task-replay ceiling) must stay
    # pure-JVM join algebra; the small-base replay is one MapInPandas task
    from data_model_spark.operators import quadtree as qmod

    monkeypatch.setattr(qmod, "_QT_SMALL_BASE", 0)
    plan = (
        quadtree_leaves(spark)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas", "CartesianProduct"):
        assert marker not in plan


def test_single_task_cascade_matches_distributed(spark, monkeypatch):
    from data_model_spark.operators import quadtree as qmod

    fast = sorted(map(tuple, qmod.quadtree_leaves(spark).collect()))
    monkeypatch.setattr(qmod, "_QT_SMALL_BASE", 0)  # force join algebra
    slow = sorted(map(tuple, qmod.quadtree_leaves(spark).collect()))
    assert fast == slow and len(fast) > 0
