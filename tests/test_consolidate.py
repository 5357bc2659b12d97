"""Consolidation regrouping over engine variable tables.

Structural twin of the reference's `tests/test_s2_data_consolidator.py`:
the same scattered-path -> (target, resolution, category, renamed-var)
regrouping, asserted on the Spark long table + per-resolution pivot.
"""

import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import consolidate as C


@pytest.fixture(scope="module")
def cons(spark):
    df = C.consolidate(C.scene_var_tables(spark))
    df.cache().count()
    return df


def var_map(cons):
    rows = cons.select("target", "resolution", "category", "out_var").distinct().collect()
    out = {}
    for r in rows:
        out.setdefault((r.target, r.resolution, r.category), set()).add(r.out_var)
    return out


class TestConsolidator:
    def test_reflectance_bands_stay_named(self, cons):
        m = var_map(cons)
        assert m[("measurements", 10, "bands")] == {"b02", "b03", "b04"}
        assert m[("measurements", 20, "bands")] == {"b05"}
        assert m[("measurements", 60, "bands")] == {"b01"}

    def test_quality_and_footprint_renames(self, cons):
        m = var_map(cons)
        assert m[("measurements", 10, "quality")] == {"quality_b02"}
        assert m[("measurements", 10, "detector_footprints")] == {
            "detector_footprint_b02"
        }

    def test_native_20m_groups(self, cons):
        m = var_map(cons)
        assert m[("measurements", 20, "atmosphere")] == {"aot", "wvp"}
        assert m[("measurements", 20, "classification")] == {"scl"}
        assert m[("measurements", 20, "probability")] == {"cld", "snw"}

    def test_geometry_and_meteorology_targets(self, cons):
        m = var_map(cons)
        assert m[("geometry", 20, "geometry")] == {"sun_zenith"}
        assert m[("meteorology", 20, "meteorology")] == {"cams_msl", "ecmwf_tco3"}

    def test_no_unknown_category(self, cons):
        assert cons.filter(F.col("category") == "unknown").count() == 0

    def test_consolidated_dataset_pivot_wide(self, spark, cons):
        """create_consolidated_dataset twin: one wide row per (y, x), one
        column per variable of that resolution, values preserved."""
        wide10 = C.consolidated_dataset(cons, 10)
        assert set(wide10.columns) == {
            "y", "x", "b02", "b03", "b04", "quality_b02", "detector_footprint_b02"
        }
        n = C.GRID_N[10]
        assert wide10.count() == n * n
        row = wide10.filter((F.col("y") == 2) & (F.col("x") == 3)).collect()[0]
        # value formula: (y*7 + x*13 + vk*31) % 997, b02 has vk=1
        assert row["b02"] == (2 * 7 + 3 * 13 + 1 * 31) % 997
        assert row["quality_b02"] == (2 * 7 + 3 * 13 + 6 * 31) % 997
        wide60 = C.consolidated_dataset(cons, 60)
        assert set(wide60.columns) == {"y", "x", "b01"}
        assert wide60.count() == C.GRID_N[60] ** 2
