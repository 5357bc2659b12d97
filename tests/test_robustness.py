"""Edge-of-domain robustness: the probes a 100 TB run WILL eventually hit.

Antimeridian wrap, polar clamp, degenerate (zero-area) polygons, empty
DataFrames flowing through every pandas-UDF operator, and single-row
inputs.  Each would be a rare-task crash at scale if unhandled.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.functions import cells, geometry
from data_model_spark.operators import dedup, spatial, tiling
from data_model_spark.sources.images import IMAGE_SCHEMA


class TestCellEdges:
    def test_k_ring_wraps_antimeridian(self):
        res = 5
        west_edge = cells.cell_of(np.array([-179.99]), np.array([0.0]), res)[0]
        ring = cells.k_ring(int(west_edge), 1)
        xs, _ = cells.cell_xy(ring)
        n = 1 << res
        # neighbors must include cells on BOTH sides of the antimeridian
        assert 0 in xs and (n - 1) in xs

    def test_k_ring_clamps_at_pole(self):
        res = 5
        top = cells.cell_of(np.array([0.0]), np.array([89.99]), res)[0]
        ring = cells.k_ring(int(top), 1)
        # 3x3 window minus the out-of-domain row above the pole
        assert len(ring) == 6
        _, ys = cells.cell_xy(ring)
        assert ys.max() == (1 << res) - 1

    def test_polygon_cover_zero_area(self):
        # degenerate polygon: all vertices identical -> cover is the single
        # containing cell, no crash, and PIP refine simply keeps nothing
        p = np.array([[10.0, 46.0], [10.0, 46.0], [10.0, 46.0]])
        cover = cells.polygon_cover(p, res=9)
        assert len(cover) >= 1
        inside = geometry.points_in_polygon(
            np.array([10.0]), np.array([46.0]), p
        )
        assert not inside[0]  # zero-area ring contains no interior


class TestEmptyInputs:
    def test_empty_images_through_tile_pipeline(self, spark):
        empty = spark.createDataFrame([], IMAGE_SCHEMA)
        tiles = tiling.build_tiles(empty, repartition=False)
        assert tiles.count() == 0
        assert tiling.merge_tiles(tiles).count() == 0

    def test_empty_points_through_pip_join(self, spark):
        pts = spark.createDataFrame([], "point_id long, lon double, lat double")
        polys = spatial.polygons_df(
            spark, {"tri": np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])}
        )
        assert spatial.pip_join_cells(pts, polys, res=7).count() == 0

    def test_empty_docs_through_minhash(self, spark):
        docs = spark.createDataFrame([], "doc_id long, text string")
        assert dedup.minhash_lsh_dedup(docs).count() == 0

    def test_single_doc_no_self_pair(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma delta")], "doc_id long, text string"
        )
        assert dedup.jaccard_pairs(docs, 0.1).count() == 0


class TestDegenerateGeometry:
    def test_pip_point_on_vertex_consistent(self, spark):
        """A query point exactly on a polygon vertex: the half-open edge rule
        gives ONE deterministic answer, identical between the broadcast and
        cell-partitioned paths."""
        ring = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
        pts = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 2.0, 2.0), (3, 1.0, 1.0)],
            "point_id long, lon double, lat double",
        )
        bc = {
            r.point_id
            for r in spatial.pip_join_broadcast(pts, {"sq": ring}).collect()
        }
        cell = {
            r.point_id
            for r in spatial.pip_join_cells(
                pts, spatial.polygons_df(spark, {"sq": ring}), res=7
            ).collect()
        }
        assert bc == cell
        assert 3 in bc  # interior point always inside


class TestRound3EmptyInputs:
    """New operator families on degenerate inputs: empty tables, tiny
    samples — must return empty/correct results, never crash."""

    def _empty_events(self, spark):
        return spark.createDataFrame(
            [],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )

    def test_sessionize_empty(self, spark):
        from data_model_spark.operators.sessions import sessionize

        assert sessionize(self._empty_events(spark)).count() == 0

    def test_cohort_retention_empty(self, spark):
        from data_model_spark.operators.sessions import cohort_retention

        assert cohort_retention(self._empty_events(spark)).count() == 0

    def test_sampling_empty(self, spark):
        from data_model_spark.operators import sampling as smp

        docs = spark.createDataFrame([], "doc_id long, lang string, text string")
        assert smp.hash_sample(docs, 0.5).count() == 0
        assert smp.stratified_hash_sample(docs, {"en": 1.0}).count() == 0
        assert smp.stratified_topn(docs, 3).count() == 0

    def test_kmeans_sample_smaller_than_k(self, spark):
        """Fewer sample vectors than k: init yields that many centroids and
        the pipeline still assigns every vector deterministically."""
        from data_model_spark.operators import ivf_kmeans as ik

        rows = [(i, [float(i), float(-i)]) for i in range(5)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = ik.ivf_kmeans_assign(df, sample_max_id=2, k=8, iters=2, dim=2)
        got = {r["vec_id"]: r["cell"] for r in out.collect()}
        assert set(got) == set(range(5)) and set(got.values()) <= {0, 1}

    def test_profile_empty(self, spark):
        from data_model_spark.operators import profile as prof

        docs = spark.createDataFrame(
            [], "doc_id long, lang string, text string, n_chars long"
        )
        assert prof.length_profile(docs).count() == 0
        assert prof.vocab_topk(docs).count() == 0
