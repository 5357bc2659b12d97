"""Spatial engine tests: PIP joins (broadcast/cell/salted), kNN, covers.

Rows-only registered queries get their exactness checks here, against
NumPy oracles and against each other (salted == unsalted, cells == brute).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.functions import geometry
from data_model_spark.operators import spatial
from data_model_spark.operators.spatial_queries import _points

SF = "/root/testdata/sf0.001"

TRI = np.array([[10.1, 46.1], [11.5, 46.2], [10.3, 47.6]])
ELL = np.array(
    [[10.0, 46.0], [11.0, 46.0], [11.0, 46.4], [10.4, 46.4], [10.4, 47.4], [10.0, 47.4]]
)


@pytest.fixture(scope="module")
def pts(spark):
    df = _points(spark, SF)
    df.cache().count()
    return df


def _numpy_assignment(pts_pdf, polys: dict):
    out = set()
    for pid, ring in polys.items():
        mask = geometry.points_in_polygon(
            pts_pdf["lon"].to_numpy(), pts_pdf["lat"].to_numpy(), ring
        )
        out |= {(int(p), pid) for p in pts_pdf["point_id"].to_numpy()[mask]}
    return out


class TestPipJoins:
    def test_broadcast_matches_numpy(self, spark, pts):
        polys = {"tri": TRI, "ell": ELL}
        got = {
            (r.point_id, r.poly_id)
            for r in spatial.pip_join_broadcast(pts, polys).collect()
        }
        assert got == _numpy_assignment(pts.toPandas(), polys)
        assert len(got) > 0

    def test_cell_join_matches_broadcast(self, spark, pts):
        polys = {"tri": TRI, "ell": ELL}
        bc = {
            (r.point_id, r.poly_id)
            for r in spatial.pip_join_broadcast(pts, polys).collect()
        }
        pdf = spatial.polygons_df(spark, polys)
        cj = {
            (r.point_id, r.poly_id)
            for r in spatial.pip_join_cells(pts, pdf, res=9).collect()
        }
        assert cj == bc

    def test_salted_equals_unsalted(self, spark, pts):
        polys = {"tri": TRI, "ell": ELL}
        pdf = spatial.polygons_df(spark, polys)
        plain = {
            (r.point_id, r.poly_id)
            for r in spatial.pip_join_cells(pts, pdf, res=9).collect()
        }
        salted = {
            (r.point_id, r.poly_id)
            for r in spatial.pip_join_cells(pts, pdf, res=9, salt=5).collect()
        }
        assert salted == plain

    def test_cell_join_single_shuffle_side(self, spark, pts):
        polys = {"tri": TRI}
        pdf = spatial.polygons_df(spark, polys)
        plan = (
            spatial.pip_join_cells(pts, pdf, res=9)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # equi-join on the cell key must be present (hash or sort-merge)
        assert "cell" in plan

    def test_broadcast_gate_falls_back_on_large_covers(self, spark, pts):
        """ADVICE: the broadcast hint must be gated — with a cover table over
        the limit, the plan must NOT force a broadcast of the covers, and the
        result stays identical."""
        polys = {"tri": TRI, "ell": ELL}
        pdf = spatial.polygons_df(spark, polys)
        forced = spatial.pip_join_cells(pts, pdf, res=9, broadcast_covers=True)
        gated = spatial.pip_join_cells(pts, pdf, res=9, broadcast_limit=0)
        # the *hint* (which bypasses size thresholds) must be gone; the
        # planner remains free to pick broadcast from its own stats
        plan_f = forced._jdf.queryExecution().analyzed().toString()
        plan_g = gated._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" in plan_f
        assert "ResolvedHint" not in plan_g
        assert {(r.point_id, r.poly_id) for r in gated.collect()} == {
            (r.point_id, r.poly_id) for r in forced.collect()
        }


class TestKnn:
    def test_cells_match_bruteforce(self, spark, pts):
        qs = (
            _points(spark, SF, "supplier", "s_suppkey")
            .filter(F.col("point_id") < 4)
            .withColumnRenamed("point_id", "query_id")
        )
        brute = {
            (r.query_id, r.rank): r.point_id
            for r in spatial.knn_bruteforce(pts, qs, k=5).collect()
        }
        ringed = {
            (r.query_id, r.rank): r.point_id
            for r in spatial.knn_join(pts, qs, k=5, res=7, ring=2).collect()
        }
        assert ringed == brute

    def test_knn_deterministic(self, spark, pts):
        qs = (
            _points(spark, SF, "supplier", "s_suppkey")
            .filter(F.col("point_id") < 2)
            .withColumnRenamed("point_id", "query_id")
        )
        a = spatial.knn_join(pts, qs, k=3, res=7, ring=2).collect()
        b = spatial.knn_join(pts, qs, k=3, res=7, ring=2).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestKnnRingGrowth:
    def test_grow_recovers_sparse_queries(self, spark):
        """A query in a sparse region finds < k candidates at ring=1; with
        grow, under-filled queries re-run with doubled rings and the result
        equals brute force; satisfied queries are untouched."""
        import numpy as np

        rng = np.random.default_rng(9)
        # dense cluster near (10, 46) + a lone far point near (14, 48)
        pts = [(i, 10.0 + rng.uniform(0, 0.05), 46.0 + rng.uniform(0, 0.05))
               for i in range(40)] + [(99, 14.0, 48.0)]
        points = spark.createDataFrame(pts, "point_id long, lon double, lat double")
        queries = spark.createDataFrame(
            [(0, 10.02, 46.02), (1, 13.9, 47.9)],
            "query_id long, lon double, lat double",
        )
        exact = {
            (r.query_id, r.rank): r.point_id
            for r in spatial.knn_bruteforce(points, queries, k=3).collect()
        }
        # ring=1 at res 9 cannot reach the dense cluster from query 1
        no_grow = spatial.knn_join(points, queries, k=3, res=9, ring=1)
        assert no_grow.filter("query_id = 1").count() < 3
        grown = {
            (r.query_id, r.rank): r.point_id
            for r in spatial.knn_join(
                points, queries, k=3, res=9, ring=1, grow=8
            ).collect()
        }
        assert grown == exact

    def test_grow_heals_boundary_miss_with_k_in_ring(self, spark):
        """The subtle case: a query already HAS k in-ring candidates, but
        the true nearest neighbor sits one cell outside the ring.  A
        count-based heal would stop; the covered-radius criterion must
        keep growing until the k-th distance is provably safe."""
        # res 9 cells: 0.703 deg lon x 0.352 deg lat. Query at (0, 0):
        # three points 1.30-1.32 deg east are ONE lon cell over (dx=1, in
        # ring=1) at ~145 km; one point 1.0 deg north (~111 km — the true
        # nearest) is ~2.8 LAT cells away, outside ring=1. Ring=1 finds
        # k=3 candidates, so a count-based heal would stop with the wrong
        # answer; the covered-radius criterion (ring * 0.352 deg * 111 km
        # ~ 39 km << kth 145 km) keeps doubling until the ring both
        # contains the northern point and proves the k-th distance safe.
        points = spark.createDataFrame(
            [(1, 1.30, 0.0), (2, 1.31, 0.0), (3, 1.32, 0.0), (9, 0.0, 1.0)],
            "point_id long, lon double, lat double",
        )
        queries = spark.createDataFrame(
            [(0, 0.0, 0.0)], "query_id long, lon double, lat double"
        )
        exact = {
            (r.query_id, r.rank): r.point_id
            for r in spatial.knn_bruteforce(points, queries, k=3).collect()
        }
        assert exact[(0, 1)] == 9  # the out-of-ring point IS the nearest
        no_grow = {
            (r.query_id, r.rank): r.point_id
            for r in spatial.knn_join(points, queries, k=3, res=9, ring=1).collect()
        }
        assert len(no_grow) == 3 and no_grow != exact  # k found, but wrong
        grown = {
            (r.query_id, r.rank): r.point_id
            for r in spatial.knn_join(
                points, queries, k=3, res=9, ring=1, grow=8
            ).collect()
        }
        assert grown == exact

    def test_grow_plan_has_no_literal_id_list(self, spark):
        """The proven-query filter is a broadcast semi/anti join against a
        proven-ids DataFrame, never an isin(<driver list>) literal — plan
        size must stay bounded for arbitrary query-set sizes."""
        import numpy as np

        rng = np.random.default_rng(9)
        pts = [(i, 10.0 + rng.uniform(0, 0.05), 46.0 + rng.uniform(0, 0.05))
               for i in range(40)] + [(99, 14.0, 48.0)]
        points = spark.createDataFrame(pts, "point_id long, lon double, lat double")
        queries = spark.createDataFrame(
            [(0, 10.02, 46.02), (1, 13.9, 47.9)],
            "query_id long, lon double, lat double",
        )
        df = spatial.knn_join(points, queries, k=3, res=9, ring=1, grow=8)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "query_id IN" not in plan and "query_id INSET" not in plan
        assert "LeftSemi" in plan and "LeftAnti" in plan


class TestCellHeatmap:
    def test_single_point_kernel_shape(self, spark):
        df = spark.createDataFrame([(1, 10.0, 46.0)], "point_id long, lon double, lat double")
        out = spatial.cell_heatmap(df, res=8).collect()
        heats = sorted(r.heat for r in out)
        assert heats == [1, 1, 1, 1, 2, 2, 2, 2, 4]
        own = {r.n_own for r in out}
        assert own == {0, 1}

    def test_heat_mass_conserved(self, spark):
        from data_model_spark.operators.dbscan import _blob_points

        pts = _blob_points(spark, "/root/testdata/sf0.001")
        out = spatial.cell_heatmap(pts, res=10).toPandas()
        n = pts.count()
        # interior points spread 4+4*2+4*1 = 16 each; lat-clamped rows lose
        # some — fixture lats are interior, so exact equality holds
        assert out.heat.sum() == 16 * n
        assert out.n_own.sum() == n

    def test_parallelism_independent(self, spark):
        from data_model_spark.operators.dbscan import _blob_points

        pts = _blob_points(spark, "/root/testdata/sf0.001")
        a = {(r.cell, r.heat, r.n_own) for r in spatial.cell_heatmap(pts.coalesce(1), res=10).collect()}
        b = {(r.cell, r.heat, r.n_own) for r in spatial.cell_heatmap(pts.repartition(32), res=10).collect()}
        assert a == b

    def test_res_guard(self, spark):
        df = spark.createDataFrame([(1, 0.0, 0.0)], "point_id long, lon double, lat double")
        import pytest as _pytest

        with _pytest.raises(ValueError, match="res >= 2"):
            spatial.cell_heatmap(df, res=1)
