"""S2-scene integration: the reference's end-to-end fixture, Spark-first.

Mirrors `tests/test_integration_sentinel2.py` (reference): a deterministic
multi-resolution scene (seed 42, EPSG:32632, extent 600000..605490 /
5090000..5095490 — FIXTURES.md §2) built as tall DataFrames, cascaded
r60 -> r120 -> r360 -> r720 with per-type semantics (A5-A8), then the
reference's structural invariants:

* pixel count strictly decreasing per level (perf assertion,
  reference `test_integration_sentinel2.py:292-366`);
* adjacent /2 levels dim ratio in [1.8, 2.2] (reference
  `conftest.py:327-341`);
* bounds consistent across levels within 2% (reference
  `test_titiler_integration.py:309-363`);
* per-type reduction values match the NumPy kernels exactly.
"""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_model_spark.functions import gridlib
from data_model_spark.operators import downsample as ds

X0, Y0, X1, Y1 = 600000.0, 5090000.0, 605490.0, 5095490.0
SEED = 42

# (band, grid_n, value_lo, value_hi, vtype) — FIXTURES.md §2 ranges
R10M = [("b02", 549, 500, 3000), ("b03", 549, 800, 4000), ("b04", 549, 600, 3500)]
R20M = [("scl", 275, 0, 12), ("cld", 275, 0, 100)]
R60M = [("b01", 92, 800, 3000), ("b09", 92, 200, 1000)]


def band_pixels(band: str, n: int, lo: int, hi: int) -> np.ndarray:
    # sha256, not builtin hash(): str hash is salted per process
    # (PYTHONHASHSEED), which would make the "seed-42" scene irreproducible
    band_key = int.from_bytes(hashlib.sha256(band.encode()).digest()[:4], "little")
    rng = np.random.default_rng(SEED + band_key % 1000)
    return rng.integers(lo, hi, size=(n, n)).astype(np.int64)


def tall_df(spark, band, n, lo, hi):
    a = band_pixels(band, n, lo, hi)
    yy, xx = np.mgrid[0:n, 0:n]
    pdf = pd.DataFrame(
        {"y": yy.ravel(), "x": xx.ravel(), "value": a.ravel().astype(float)}
    )
    return spark.createDataFrame(pdf), a


@pytest.fixture(scope="module")
def scene(spark):
    out = {}
    for band, n, lo, hi in R10M + R20M + R60M:
        out[band] = tall_df(spark, band, n, lo, hi)
    return out


class TestS2Cascade:
    def test_reflectance_cascade_dims_and_values(self, spark, scene):
        """b01 r60 (92x92) -> /2 -> /2: dims + mean values vs NumPy kernel."""
        df, a = scene["b01"]
        sizes = [92]
        cur_df, cur_a = df, a.astype(float)
        for _step in range(2):
            n = sizes[-1]
            tgt = n // 2
            lvl = ds.sql_block_mean(cur_df, 2)
            got = lvl.toPandas().sort_values(["blk_y", "blk_x"])
            exp = ds.block_mean(cur_a[: tgt * 2, : tgt * 2], tgt, tgt)
            assert len(got) == tgt * tgt
            np.testing.assert_allclose(
                got["mean_value"].to_numpy().reshape(tgt, tgt), exp, rtol=1e-12
            )
            # rebuild tall df for the next level from the exact kernel result
            yy, xx = np.mgrid[0:tgt, 0:tgt]
            cur_df = spark.createDataFrame(
                pd.DataFrame(
                    {"y": yy.ravel(), "x": xx.ravel(), "value": exp.ravel()}
                )
            )
            cur_a = exp
            sizes.append(tgt)
        # reference invariant: adjacent level ratio within [1.8, 2.2]
        for a_, b_ in zip(sizes, sizes[1:]):
            assert 1.8 <= a_ / b_ <= 2.2
        # pixel count strictly decreasing (perf assertion shape)
        counts = [s * s for s in sizes]
        assert all(c1 > c2 for c1, c2 in zip(counts, counts[1:]))

    def test_classification_center_pick_semantics(self, spark, scene):
        df, a = scene["scl"]
        got = (
            ds.sql_center_pick(df, 5)
            .toPandas()
            .sort_values(["blk_y", "blk_x"])
        )
        exp = ds.classification_pick(a.astype(float), 55, 55)
        assert len(got) == 55 * 55
        np.testing.assert_array_equal(
            got["picked"].to_numpy().reshape(55, 55), exp
        )

    def test_probability_clamped_mean(self, spark, scene):
        df, a = scene["cld"]
        got = (
            ds.sql_probability_mean(df, 5, hi=100.0)
            .toPandas()
            .sort_values(["blk_y", "blk_x"])
        )
        exp = ds.probability_mean(a[:275, :275].astype(float), 55, 55)
        np.testing.assert_allclose(
            got["mean_value"].to_numpy().reshape(55, 55), exp, rtol=1e-12
        )
        assert got["mean_value"].between(0, 100).all()

    def test_mask_or_on_derived_mask(self, spark, scene):
        df, _ = scene["scl"]
        mask_df = df.select("y", "x", (F.col("value") == 3).cast("int").alias("value"))
        got = ds.sql_mask_or(mask_df, 5).toPandas().sort_values(["blk_y", "blk_x"])
        _, a = scene["scl"]
        exp = ds.quality_mask_or((a == 3).astype(float), 55, 55)
        np.testing.assert_array_equal(got["mask"].to_numpy().reshape(55, 55), exp)

    def test_bounds_consistent_across_levels(self):
        """Affine bounds drift <= 2% across the full pyramid (R4 invariant)."""
        levels = gridlib.overview_levels(549, 549, min_dimension=64)
        assert len(levels) >= 3
        base_t = gridlib.affine_from_bounds(X0, Y0, X1, Y1, 549, 549)
        base_w = base_t[0] * 549  # extent from transform
        for lv in levels:
            t = gridlib.affine_from_bounds(X0, Y0, X1, Y1, lv["width"], lv["height"])
            w = t[0] * lv["width"]
            assert abs(w - base_w) / base_w <= 0.02
            # origin fixed
            assert t[2] == X0 and t[5] == Y1

    def test_layout_metadata_matches_minispec_shape(self):
        levels = gridlib.overview_levels(549, 549, min_dimension=64)
        geoms = [
            gridlib.LevelGeom(
                asset=f"lvl{d['level']}",
                width=d["width"],
                height=d["height"],
                resolution_m=10.0 * d["scale_relative"],
                derived_from=None if d["level"] == 0 else f"lvl{d['level'] - 1}",
            )
            for d in levels
        ]
        layout = gridlib.multiscale_layout(geoms, (X0, Y0, X1, Y1))
        assert layout.resampling_method == "average"
        for entry in layout.levels:
            assert set(entry) >= {
                "asset",
                "derived_from",
                "zoom",
                "transform",
                "spatial:shape",
                "spatial:transform",
            }
            assert entry["transform"]["translation"] == 0.0
            assert len(entry["spatial:transform"]) == 6
        # relative scale between adjacent levels ~2 (issue #114 semantics:
        # actual parent/child dim ratio, not nominal)
        for entry in layout.levels[1:]:
            assert 1.8 <= entry["transform"]["scale"] <= 2.2
