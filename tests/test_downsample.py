"""Kernel goldens mirroring the reference's unit tests (FIXTURES.md §4)."""

import numpy as np
import pytest

from data_model_spark.operators import downsample as ds


class TestBlockMean:
    def test_golden_4x4(self):
        a = np.arange(1, 17, dtype=np.float64).reshape(4, 4)
        np.testing.assert_array_equal(
            ds.block_mean(a, 2, 2), [[3.5, 5.5], [11.5, 13.5]]
        )

    def test_subsample_golden_3x3(self):
        a = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
        np.testing.assert_array_equal(ds.block_mean(a, 2, 2), [[1, 3], [7, 9]])

    def test_crop_non_divisible(self):
        a = np.arange(25, dtype=np.float64).reshape(5, 5)
        out = ds.block_mean(a, 2, 2)  # crops to 4x4
        expected = a[:4, :4].reshape(2, 2, 2, 2).mean(axis=(1, 3))
        np.testing.assert_array_equal(out, expected)

    def test_nodata_excluded(self):
        a = np.array([[1.0, 999.0], [3.0, 999.0], [999.0, 999.0], [999.0, 999.0]])
        out = ds.block_mean(a, 2, 1, nodata=999.0)
        assert out[0, 0] == 2.0  # mean of {1, 3}
        assert out[1, 0] == 999.0  # all-nodata block preserved

    def test_nan_nodata(self):
        a = np.array([[1.0, np.nan], [3.0, np.nan]])
        out = ds.block_mean(a, 1, 1, nodata=np.nan)
        assert out[0, 0] == 2.0

    def test_3d_time_axis(self):
        a = np.stack([np.arange(16).reshape(4, 4), np.arange(16, 32).reshape(4, 4)]).astype(float)
        out = ds.block_mean(a, 2, 2)
        assert out.shape == (2, 2, 2)
        np.testing.assert_array_equal(out[0], [[2.5, 4.5], [10.5, 12.5]])


class TestSumCountCascade:
    def test_cascade_exact_vs_direct(self):
        rng = np.random.default_rng(42)
        a = rng.uniform(0, 100, (16, 16))
        # direct /4 mean
        direct = ds.block_mean(a, 4, 4)
        # cascaded via (sum, count): /2 then /2
        s1, c1 = ds.block_sum_count(a, 8, 8)
        # reduce the (sum,count) grids again
        s2 = s1.reshape(4, 2, 4, 2).sum(axis=(1, 3))
        c2 = c1.reshape(4, 2, 4, 2).sum(axis=(1, 3))
        np.testing.assert_allclose(s2 / c2, direct, rtol=1e-12)

    def test_mean_of_means_differs_under_uneven(self):
        # prove why the carry matters: nodata makes blocks uneven
        a = np.array([[1.0, 999.0, 5.0, 7.0], [999.0, 999.0, 9.0, 11.0]] * 2)
        s, c = ds.block_sum_count(a, 1, 1, nodata=999.0)
        exact = s.sum() / c.sum()
        level1 = ds.block_mean(a, 2, 2, nodata=999.0)
        mom = level1.mean()
        assert exact != pytest.approx(mom)


class TestClassificationPick:
    def test_center_pixel_even_block(self):
        a = np.arange(16).reshape(4, 4)
        # block 2x2, center (1,1) of each block -> values 5,7,13,15
        np.testing.assert_array_equal(ds.classification_pick(a, 2, 2), [[5, 7], [13, 15]])

    def test_odd_block(self):
        a = np.arange(36).reshape(6, 6)
        # block 3x3, center (1,1) -> rows 1,4 cols 1,4
        np.testing.assert_array_equal(ds.classification_pick(a, 2, 2), [[7, 10], [25, 28]])

    def test_3d(self):
        a = np.arange(32).reshape(2, 4, 4)
        out = ds.classification_pick(a, 2, 2)
        assert out.shape == (2, 2, 2)


class TestQualityMaskProbability:
    def test_mask_or(self):
        a = np.zeros((4, 4), dtype=np.uint8)
        a[0, 1] = 1
        np.testing.assert_array_equal(ds.quality_mask_or(a, 2, 2), [[1, 0], [0, 0]])
        assert ds.quality_mask_or(a, 2, 2).dtype == np.uint8

    def test_probability_clamp_unit(self):
        a = np.full((4, 4), 0.5)
        a[0, 0] = 1.0
        out = ds.probability_mean(a, 2, 2)
        assert out.max() <= 1.0

    def test_probability_clamp_percent(self):
        a = np.full((4, 4), 60.0)
        out = ds.probability_mean(a, 2, 2)
        assert out.max() <= 100.0
        assert out[0, 0] == 60.0


class TestDispatch:
    @pytest.mark.parametrize(
        "name,expected",
        [
            ("b02", "reflectance"),
            ("b8a", "reflectance"),
            ("scl", "classification"),
            ("cld", "probability"),
            ("snw", "probability"),
            ("aot", "reflectance"),
            ("wvp", "reflectance"),
            ("detector_footprint_b01", "quality_mask"),
            ("quality_l2a", "quality_mask"),
            ("unknown_var", "reflectance"),
        ],
    )
    def test_variable_type(self, name, expected):
        assert ds.variable_type(name) == expected

    def test_downsample_preserves_dtype(self):
        a = np.arange(16, dtype=np.uint16).reshape(4, 4)
        assert ds.downsample(a, 2, 2, "b02").dtype == np.uint16
        assert ds.downsample(a, 2, 2, "scl").dtype == np.uint16


class TestGcpDedup:
    def test_duplicate_collapse(self):
        line = np.array([0.0, 0.4, 10.0])
        pixel = np.array([0.0, 0.4, 10.0])
        vals = np.array([[1.0], [3.0], [5.0]])
        lo, po, mo = ds.gcp_dedup_mean(line, pixel, vals, factor=2.0)
        # first two collapse to (0,0): mean 2.0; third -> (5,5): 5.0
        assert list(lo) == [0, 5]
        np.testing.assert_array_equal(mo, [[2.0], [5.0]])
