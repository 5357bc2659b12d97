"""GCP warp kernels + Spark reprojection operator (SURVEY §2.8 R1/R2).

Mirrors the reference's S1 integration strategy
(tests/test_integration_sentinel1.py): a linear GCP grid makes the warp
exactly invertible, so output values are checked against a direct NumPy
oracle, not just shapes.
"""

import numpy as np
import pandas as pd
import pytest

from data_model_spark.functions import warp
from data_model_spark.operators import reproject as rp


def linear_gcps(h=40, w=60, n_lines=5, n_pixels=7):
    ll, pp = np.meshgrid(
        np.linspace(0, h - 1, n_lines), np.linspace(0, w - 1, n_pixels), indexing="ij"
    )
    lat = 39.0 + 2.0 * ll / (h - 1)
    lon = 15.0 + 3.0 * pp / (w - 1)
    return ll.ravel(), pp.ravel(), lat.ravel(), lon.ravel()


class TestFit:
    def test_affine_fit_is_exact(self):
        line, pixel, lat, lon = linear_gcps()
        cl, cp, rms = warp.fit_gcp_inverse(line, pixel, lat, lon, order=1)
        assert rms < 1e-9
        # inverse map reproduces every GCP
        lf, pf = warp.eval_gcp_inverse(cl, cp, lon, lat, order=1)
        np.testing.assert_allclose(lf, line, atol=1e-8)
        np.testing.assert_allclose(pf, pixel, atol=1e-8)

    def test_quadratic_geometry_needs_order_2(self):
        rng = np.random.default_rng(42)
        lon = rng.uniform(15, 18, 60)
        lat = rng.uniform(39, 41, 60)
        line = 3.0 + 5.0 * lat + 0.8 * lat**2
        pixel = 1.0 + 4.0 * lon + 0.3 * lon * lat
        _, _, rms1 = warp.fit_gcp_inverse(line, pixel, lat, lon, order=1)
        _, _, rms2 = warp.fit_gcp_inverse(line, pixel, lat, lon, order=2)
        assert rms1 > 1e-2
        assert rms2 < 1e-6

    def test_too_few_gcps_raises(self):
        with pytest.raises(ValueError):
            warp.fit_gcp_inverse([0, 1], [0, 1], [39, 40], [15, 16], order=2)


class TestGrid:
    def test_target_grid_convention(self):
        # x ascending, y descending, cell centers, bbox from GCP extremes
        lons, lats = warp.target_grid_from_gcps(
            np.array([39.0, 41.0]), np.array([15.0, 18.0]), 6, 4
        )
        assert lons[0] == pytest.approx(15.25) and lons[-1] == pytest.approx(17.75)
        assert lats[0] == pytest.approx(40.75) and lats[-1] == pytest.approx(39.25)
        assert np.all(np.diff(lons) > 0) and np.all(np.diff(lats) < 0)


class TestBilinear:
    def test_exact_on_grid_points(self):
        src = np.arange(12, dtype=np.float64).reshape(3, 4)
        out = warp.bilinear_sample(src, np.array([0.0, 2.0]), np.array([0.0, 3.0]), -1)
        np.testing.assert_allclose(out, [0.0, 11.0])

    def test_midpoint_interpolation(self):
        src = np.array([[0.0, 2.0], [4.0, 6.0]])
        out = warp.bilinear_sample(src, np.array([0.5]), np.array([0.5]), -1)
        np.testing.assert_allclose(out, [3.0])

    def test_out_of_bounds_is_nodata(self):
        src = np.ones((3, 3))
        out = warp.bilinear_sample(
            src, np.array([-0.1, 2.1, 1.0]), np.array([1.0, 1.0, 3.01]), 9.0
        )
        np.testing.assert_allclose(out, [9.0, 9.0, 9.0])

    def test_nodata_neighbor_poisons_cell(self):
        src = np.array([[1.0, 255.0], [1.0, 1.0]])
        out = warp.bilinear_sample(src, np.array([0.5, 0.9]), np.array([0.4, 0.0]), 255.0)
        assert out[0] == 255.0  # touches the nodata corner
        assert out[1] != 255.0  # interior column untouched

    def test_nan_nodata(self):
        src = np.array([[1.0, np.nan], [1.0, 1.0]])
        out = warp.bilinear_sample(src, np.array([0.5]), np.array([0.5]), np.nan)
        assert np.isnan(out[0])


class TestWarpGolden:
    def test_affine_warp_matches_direct_oracle(self):
        """With affine GCPs the inverse map is known in closed form — compare
        the full warp against a hand-built oracle."""
        h, w = 40, 60
        line, pixel, lat, lon = linear_gcps(h, w)
        src = ((np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 200).astype(
            np.float64
        )
        out, lons, lats = warp.warp_gcp(src, line, pixel, lat, lon, nodata=-1.0)
        # oracle: closed-form inverse of the linear GCP mapping
        lon_m, lat_m = np.meshgrid(lons, lats)
        lf = (lat_m - 39.0) * (h - 1) / 2.0
        pf = (lon_m - 15.0) * (w - 1) / 3.0
        exp = warp.bilinear_sample(src, lf, pf, -1.0)
        np.testing.assert_allclose(out, exp, atol=1e-9)
        # interior is fully valid
        assert (out[1:-1, 1:-1] != -1.0).all()

    def test_default_nodata_table(self):
        assert warp.default_nodata(np.uint8) == 255.0
        assert warp.default_nodata(np.uint16) == 65535.0
        assert warp.default_nodata(np.int16) == -32768.0
        assert warp.default_nodata(np.int32) == 0.0
        assert np.isnan(warp.default_nodata(np.float32))


class TestSparkReproject:
    def test_scene_warp_matches_numpy(self, spark):
        meas = rp.synth_s1_measurements(spark)
        gcps = rp.synth_s1_gcps()
        got = (
            reprojected := rp.reproject_gcp(
                meas, gcps, rp.S1_W, rp.S1_H, nodata=rp.S1_NODATA
            )
        ).toPandas()
        assert set(got["pol"]) == {"VV", "VH"}
        LL, PP = np.meshgrid(
            np.arange(rp.S1_H), np.arange(rp.S1_W), indexing="ij"
        )
        for pol, flip in (("VV", False), ("VH", True)):
            sub = got[got["pol"] == pol]
            src = (
                rp.s1_value(LL, PP) if not flip else rp.s1_value(PP, LL)
            ).astype(np.float64)
            exp, lons, lats = warp.warp_gcp(
                src,
                gcps["line"],
                gcps["pixel"],
                gcps["latitude"],
                gcps["longitude"],
                nodata=rp.S1_NODATA,
            )
            exp_df = pd.DataFrame(
                {
                    "row": np.nonzero(exp != rp.S1_NODATA)[0],
                    "col": np.nonzero(exp != rp.S1_NODATA)[1],
                }
            )
            assert len(sub) == len(exp_df)
            m = {(r.row, r.col): r.value for r in sub.itertuples(index=False)}
            for r, c in exp_df.itertuples(index=False):
                assert m[(r, c)] == pytest.approx(exp[r, c], abs=1e-9)

    def test_registered_queries_run(self, spark):
        from data_model_spark.operators.registry import all_queries

        qs = all_queries()
        w = qs["gcp_warp"].spark_fn(spark, "/root/testdata/sf0.001").toPandas()
        assert list(w["pol"]) == ["VH", "VV"]
        assert (w["n_valid"] > 0.9 * rp.S1_W * rp.S1_H).all()
        g = qs["gcp_overview_gcps"].spark_fn(spark, "/root/testdata/sf0.001").toPandas()
        # /2 overview of a 7x9 GCP grid keeps 7x9 distinct rounded keys here;
        # golden: means of duplicate-rounded cells match the NumPy groupby
        gcps = rp.synth_s1_gcps()
        gcps["line"] = (gcps["line"] / 2.0).round().astype("int64")
        gcps["pixel"] = (gcps["pixel"] / 2.0).round().astype("int64")
        exp = (
            gcps.groupby(["line", "pixel"], as_index=False)[
                ["latitude", "longitude", "height"]
            ]
            .mean()
            .sort_values(["line", "pixel"])
            .reset_index(drop=True)
        )
        assert len(g) == len(exp)
        np.testing.assert_allclose(
            g[["latitude", "longitude"]].to_numpy(),
            exp[["latitude", "longitude"]].to_numpy(),
            atol=1e-8,
        )

    def test_overview_gcps_rounds_half_to_even(self, spark):
        """Odd half-integers (5/2=2.5) must round like np.round (-> 2, not
        HALF_UP's 3) to match the reference's compute_overview_gcps."""
        from data_model_spark.sources.tables import local_df

        line = np.array([1, 3, 5, 7, 9, 10], dtype=np.int64)
        pixel = np.array([5, 5, 5, 5, 5, 5], dtype=np.int64)
        pdf = pd.DataFrame(
            {
                "line": line,
                "pixel": pixel,
                "latitude": line * 1.0,
                "longitude": pixel * 1.0,
                "height": 0.0,
            }
        )
        g = local_df(
            spark,
            pdf,
            "line long, pixel long, latitude double, longitude double, height double",
        )
        got = rp.overview_gcps(g, 2.0).toPandas()
        lk = np.round(line / 2.0).astype(np.int64)  # [0, 2, 2, 4, 4, 5]
        pk = np.round(pixel / 2.0).astype(np.int64)  # all 2 (2.5 -> 2)
        exp = (
            pdf.assign(line=lk, pixel=pk)
            .groupby(["line", "pixel"], as_index=False)[
                ["latitude", "longitude", "height"]
            ]
            .mean()
            .sort_values(["line", "pixel"])
            .reset_index(drop=True)
        )
        assert (pk == 2).all()  # the fixture actually exercises odd halves
        assert list(got["line"]) == list(exp["line"])
        assert list(got["pixel"]) == list(exp["pixel"])
        np.testing.assert_allclose(
            got[["latitude", "longitude"]].to_numpy(),
            exp[["latitude", "longitude"]].to_numpy(),
            atol=1e-8,
        )


class TestWarpFingerprintTwin:
    """gcp_warp_fp oracle-builder pins (Spark-vs-DuckDB equality is the
    parity gate's job — these guard the replay's non-vacuousness)."""

    def test_oracle_rows_nonvacuous(self):
        import duckdb

        df = duckdb.sql(rp._gcp_warp_fp_oracle()).fetchdf()
        assert list(df["pol"]) == ["VH", "VV"]
        # both pols warp the full scene footprint...
        assert (df["n_valid"] > 0.9 * rp.S1_W * rp.S1_H).all()
        # ...but carry DIFFERENT pixel values (transposed pattern), so a
        # pol mixup cannot hash-match
        assert df["value_milli_sum"].nunique() == 2

    def test_twin_matches_oracle_endtoend(self, spark):
        import duckdb

        got = (
            rp.gcp_warp_fp(spark, "/root/testdata/sf0.001")
            .toPandas()
            .sort_values("pol")
            .reset_index(drop=True)
        )
        want = (
            duckdb.sql(rp._gcp_warp_fp_oracle())
            .fetchdf()
            .sort_values("pol")
            .reset_index(drop=True)
        )
        for c in want.columns:
            assert list(got[c]) == list(want[c]), c
