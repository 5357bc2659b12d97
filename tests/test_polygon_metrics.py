"""Polygon metrics: shoelace goldens + orientation safety."""

from data_model_spark.operators.polygon_metrics import Q, polygon_metrics


def _verts(spark, rows):
    return spark.createDataFrame(rows, "poly_id string, idx long, qx long, qy long")


def test_unit_square_and_triangle_goldens(spark):
    sq = [("sq", i, x * Q, y * Q) for i, (x, y) in enumerate([(0, 0), (1, 0), (1, 1), (0, 1)])]
    tri = [("tri", i, x, y) for i, (x, y) in enumerate([(0, 0), (4, 0), (0, 3)])]
    out = {r.poly_id: r for r in polygon_metrics(_verts(spark, sq + tri)).collect()}
    assert out["sq"].area2 == 2 * Q * Q  # |2A| of the unit-degree square
    assert (out["sq"].cx, out["sq"].cy) == (0.5, 0.5)
    assert out["tri"].area2 == 12  # 2A = 2 * (4*3/2 = 6)
    # centroid of the right triangle = (4/3, 1)/Q rounded
    assert abs(out["tri"].cx - round(4 / 3 / Q, 6)) < 1e-9
    assert abs(out["tri"].cy - round(1 / Q, 6)) < 1e-9


def test_orientation_invariant(spark):
    cw = [("p", i, x, y) for i, (x, y) in enumerate([(0, 0), (0, 3), (4, 0)])]
    ccw = [("p", i, x, y) for i, (x, y) in enumerate([(0, 0), (4, 0), (0, 3)])]
    a = polygon_metrics(_verts(spark, cw)).collect()[0]
    b = polygon_metrics(_verts(spark, ccw)).collect()[0]
    assert a.area2 == b.area2 == 12
    assert (a.cx, a.cy) == (b.cx, b.cy)
