"""Segment rasterization + IDW surface tests (NumPy ground truth)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import spatial, surfaces
from data_model_spark.sources.tables import local_df

RES = 12
N = 1 << RES


def _cover_rows(spark, segs):
    df = local_df(
        spark,
        [(i, *map(float, s)) for i, s in enumerate(segs)],
        "seg_id long, lon0 double, lat0 double, lon1 double, lat1 double",
    )
    out = spatial.segment_cover_cells(df, res=RES)
    return {
        (r.seg_id, r.cell_x, r.cell_y): r.cell
        for r in out.collect()
    }


def _grid(lon, lat):
    return (lon + 180.0) / 360.0 * N, (lat + 90.0) / 180.0 * N


class TestSegmentCover:
    def test_samples_always_covered(self, spark):
        """Every dense sample along each segment falls in a covered cell
        (conservative-cover completeness)."""
        rng = np.random.default_rng(7)
        segs = np.column_stack(
            [
                rng.uniform(10, 12, 40),
                rng.uniform(45, 47, 40),
                rng.uniform(10, 12, 40),
                rng.uniform(45, 47, 40),
            ]
        )
        got = _cover_rows(spark, segs)
        for i, (a, b, c, d) in enumerate(segs):
            t = np.linspace(0, 1, 257)
            gx, gy = _grid(a + (c - a) * t, b + (d - b) * t)
            for cx, cy in zip(np.floor(gx).astype(int), np.floor(gy).astype(int)):
                assert (i, cx, cy) in got, (i, cx, cy)

    def test_no_spurious_cells(self, spark):
        """Each covered cell's closed square really intersects the closed
        segment: its bbox overlaps and its corners straddle the line."""
        segs = [(10.0, 46.0, 11.3, 46.9), (10.5, 46.5, 10.5, 45.2),
                (11.0, 45.5, 10.0, 45.5), (10.25, 46.25, 10.25, 46.25)]
        got = _cover_rows(spark, segs)
        for (i, cx, cy), _ in got.items():
            a, b, c, d = segs[i]
            gx0, gy0 = _grid(a, b)
            gx1, gy1 = _grid(c, d)
            assert min(gx0, gx1) < cx + 1 + 1e-9 and max(gx0, gx1) > cx - 1e-9
            assert min(gy0, gy1) < cy + 1 + 1e-9 and max(gy0, gy1) > cy - 1e-9
            corners = [
                (gx1 - gx0) * (yy - gy0) - (gy1 - gy0) * (xx - gx0)
                for xx in (cx, cx + 1)
                for yy in (cy, cy + 1)
            ]
            assert min(corners) <= 1e-9 and max(corners) >= -1e-9

    def test_degenerate_point_segment(self, spark):
        got = _cover_rows(spark, [(10.31, 46.17, 10.31, 46.17)])
        gx, gy = _grid(10.31, 46.17)
        assert set(got) == {(0, int(np.floor(gx)), int(np.floor(gy)))}

    def test_axis_aligned_counts(self, spark):
        """Horizontal segment spanning k columns covers exactly k cells."""
        lat = 46.0 + 0.5 * 180.0 / N  # mid-row, away from row boundaries
        got = _cover_rows(spark, [(10.0, lat, 10.5, lat)])
        gx0, _ = _grid(10.0, lat)
        gx1, _ = _grid(10.5, lat)
        expect = int(np.floor(gx1)) - int(np.floor(gx0)) + 1
        assert len(got) == expect
        assert len({cy for (_, _, cy) in got}) == 1


class TestIdwGrid:
    def _pts(self, spark, n=200):
        rng = np.random.default_rng(11)
        rows = [
            (int(i), float(lo), float(la), float(v))
            for i, (lo, la, v) in enumerate(
                zip(
                    rng.uniform(10.0, 10.6, n),
                    rng.uniform(46.0, 46.6, n),
                    rng.uniform(0, 100, n),
                )
            )
        ]
        return rows, local_df(
            spark, rows, "point_id long, lon double, lat double, value double"
        )

    def test_matches_numpy(self, spark):
        rows, pts = self._pts(spark)
        box = (10.1, 46.1, 10.5, 46.5)
        targets = surfaces.grid_window(spark, RES, *box)
        got = {
            (r.tx, r.ty): (r.idw_value, r.n_pts)
            for r in surfaces.idw_grid(pts, targets, res=RES, ring=1).collect()
        }
        lon = np.array([r[1] for r in rows])
        lat = np.array([r[2] for r in rows])
        val = np.array([r[3] for r in rows])
        cx = np.floor((lon + 180.0) / 360.0 * N).astype(np.int64)
        cy = np.floor((lat + 90.0) / 180.0 * N).astype(np.int64)
        tx0, tx1 = int((box[0] + 180.0) / 360.0 * N), int((box[2] + 180.0) / 360.0 * N)
        ty0, ty1 = int((box[1] + 90.0) / 180.0 * N), int((box[3] + 90.0) / 180.0 * N)
        want = {}
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                m = (np.abs(cx - tx) <= 1) & (np.abs(cy - ty) <= 1)
                if not m.any():
                    continue
                clon = (tx + 0.5) / N * 360.0 - 180.0
                clat = (ty + 0.5) / N * 180.0 - 90.0
                d2 = (lon[m] - clon) ** 2 + (lat[m] - clat) ** 2
                w = 1.0 / (d2 + 1e-6)
                want[(tx, ty)] = ((w * val[m]).sum() / w.sum(), int(m.sum()))
        assert set(got) == set(want)
        for k, (v, c) in want.items():
            assert got[k][1] == c
            assert got[k][0] == pytest.approx(v, rel=1e-9)

    def test_empty_neighborhoods_absent(self, spark):
        _, pts = self._pts(spark, n=3)
        targets = surfaces.grid_window(spark, RES, 11.5, 47.5, 11.6, 47.6)
        assert surfaces.idw_grid(pts, targets, res=RES).count() == 0

    def test_no_cartesian_in_plan(self, spark):
        _, pts = self._pts(spark, n=10)
        targets = surfaces.grid_window(spark, RES, 10.1, 46.1, 10.2, 46.2)
        plan = surfaces.idw_grid(pts, targets, res=RES)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
