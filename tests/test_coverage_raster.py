"""Detection coverage QA (union area, calibration) + line rasterization."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.boxes import _FP_N, _np_boxes, boxes_from_ids
from data_model_spark.operators.coverage import (
    _calib_replay,
    box_union_area,
    union_area_np,
)
from data_model_spark.operators.rasterize import (
    CANVAS,
    TILE,
    bresenham,
    rasterize_lines,
    seg_endpoints,
)


def test_union_area_planted_cases(spark):
    """Disjoint -> sum; nested -> outer; partial overlap -> exact."""
    rows = [
        # scene 0: disjoint 10x10 + 5x5
        (1, 0, 0, 0, 10, 10, 100, 0),
        (2, 0, 20, 20, 25, 25, 25, 0),
        # scene 1: nested
        (3, 1, 0, 0, 100, 100, 10000, 0),
        (4, 1, 10, 10, 20, 20, 100, 0),
        # scene 2: 10x10 overlapping 10x10 shifted by 5 -> 175
        (5, 2, 0, 0, 10, 10, 100, 0),
        (6, 2, 5, 5, 15, 15, 100, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "box_id long, scene long, x0 long, y0 long, x1 long, y1 long,"
        " area long, score long",
    )
    got = {r.scene: r.union_area for r in box_union_area(df).collect()}
    assert got == {0: 125, 1: 10000, 2: 175}


def test_union_area_spark_equals_numpy_sweep(spark):
    n = 1200
    ids = spark.range(n).select(F.col("id").alias("event_id"))
    got = {
        (r.scene, r.n_boxes, r.sum_area, r.union_area)
        for r in box_union_area(boxes_from_ids(ids)).collect()
    }
    b = _np_boxes(np.arange(n))
    want = set()
    for scene in range(200):
        idx = np.flatnonzero(b["scene"] == scene)
        want.add(
            (scene, len(idx), int(b["area"][idx].sum()),
             union_area_np(b, idx))
        )
    assert got == want
    # non-vacuous: overlaps exist, so union < sum somewhere
    assert any(u < s for _, _, s, u in got)


def test_calibration_totals_are_consistent():
    rows = _calib_replay()
    assert sum(n for _, n, _ in rows) == _FP_N
    assert all(0 <= tp <= n for _, n, tp in rows)
    assert len(rows) == 10
    assert sum(tp for _, _, tp in rows) > 0


def test_bresenham_goldens():
    xs, ys = bresenham(0, 0, 3, 1)  # classic shallow line
    assert list(zip(xs, ys)) == [(0, 0), (1, 0), (2, 1), (3, 1)]
    xs, ys = bresenham(0, 0, 0, 4)  # vertical
    assert list(xs) == [0] * 5 and list(ys) == [0, 1, 2, 3, 4]
    xs, ys = bresenham(5, 5, 1, 1)  # reverse diagonal
    assert list(zip(xs, ys)) == [(5, 5), (4, 4), (3, 3), (2, 2), (1, 1)]
    xs, ys = bresenham(2, 3, 2, 3)  # degenerate point
    assert list(zip(xs, ys)) == [(2, 3)]


def test_bresenham_pixel_count_property():
    """8-connected walk visits exactly max(|dx|, |dy|) + 1 pixels."""
    x0, y0, x1, y1 = seg_endpoints(np.arange(300))
    for i in range(300):
        xs, _ = bresenham(int(x0[i]), int(y0[i]), int(x1[i]), int(y1[i]))
        want = max(abs(int(x1[i] - x0[i])), abs(int(y1[i] - y0[i]))) + 1
        assert len(xs) == want


def test_fixture_endpoints_stay_in_canvas():
    x0, y0, x1, y1 = seg_endpoints(np.arange(5000))
    for a in (x0, y0, x1, y1):
        assert a.min() >= 0 and a.max() < CANVAS


def test_rasterize_spark_equals_direct_burn(spark):
    """Engine per-tile sums == an independent whole-canvas burn at a
    size different from the oracle fixture."""
    n = 137
    segs = spark.range(n).select(F.col("id").alias("seg_id"))
    got = {
        (r.tile_x, r.tile_y): (r.n_px, r.xsum, r.ysum, r.wsum)
        for r in rasterize_lines(segs).collect()
    }
    acc: dict[tuple, list] = {}
    x0, y0, x1, y1 = seg_endpoints(np.arange(n))
    for i in range(n):
        xs, ys = bresenham(int(x0[i]), int(y0[i]), int(x1[i]), int(y1[i]))
        for x, y in zip(xs.tolist(), ys.tolist()):
            k = (x // TILE, y // TILE)
            row = acc.setdefault(k, [0, 0, 0, 0])
            row[0] += 1
            row[1] += x
            row[2] += y
            row[3] += x * CANVAS + y
    assert got == {k: tuple(v) for k, v in acc.items()}
