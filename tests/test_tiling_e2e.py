"""End-to-end flagship slice: synth images -> decode -> pyramid -> tiles.

Oracle: pure-NumPy recomputation of tile assignment and pixel content per
image (SURVEY.md §7 step 3).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.operators import tiling
from data_model_spark.operators.downsample import block_mean
from data_model_spark.sources import images as img_src

N_IMAGES = 24
DIMS = (64, 256, 512)


@pytest.fixture(scope="module")
def images_df(spark):
    df = img_src.generate_images_df(spark, N_IMAGES, num_partitions=4)
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def tiles_df(images_df):
    t = tiling.build_tiles(images_df, min_dimension=64)
    t.cache().count()
    return t


class TestGeneration:
    def test_schema_and_determinism(self, images_df):
        assert set(images_df.columns) == {
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        }
        pdf = images_df.orderBy("image_id").toPandas()
        assert len(pdf) == N_IMAGES
        local = img_src.generate_images_pandas(N_IMAGES)
        # distributed generation == driver-side generation, byte for byte
        for col in ("image_id", "w", "h", "fmt", "caption", "phash"):
            assert list(pdf[col]) == list(local[col]), col
        assert all(bytes(a) == bytes(b) for a, b in zip(pdf["bytes"], local["bytes"]))

    def test_validation_gate(self, images_df):
        v = tiling.validate_images(images_df).toPandas()
        assert v["caption_ok"].all()
        assert v["phash_ok"].all()
        assert (v["psnr_db"] >= 40.0).all()
        lossy = v[v["fmt"] == "jpeg"]
        assert np.isfinite(lossy["psnr_db"]).all()  # genuinely lossy
        lossless = v[v["fmt"] != "jpeg"]
        assert np.isinf(lossless["psnr_db"]).all()


class TestTileAssignment:
    def test_level0_tile_keys_match_oracle(self, tiles_df):
        got = {
            (r.image_id, r.tile_x, r.tile_y)
            for r in tiles_df.filter("level = 0").collect()
        }
        expected = set()
        tile_m = tiling.TILE_PX * img_src.PIXEL_SIZE_M
        for i in range(N_IMAGES):
            image_id = f"img_{i:012d}"
            w, h = img_src.image_dims(i)
            ax, ay = img_src.scene_anchor(i)
            for tx in range(int(ax // tile_m), int((ax + w * 10 - 1e-9) // tile_m) + 1):
                for ty in range(int(ay // tile_m), int((ay + h * 10 - 1e-9) // tile_m) + 1):
                    expected.add((image_id, tx, ty))
        assert got == expected

    def test_pixels_roundtrip_level0(self, tiles_df):
        # level-0 tiles of a lossless image must reproduce the source exactly
        row = (
            tiles_df.filter("level = 0 AND image_id = 'img_000000000001'")
            .orderBy("tile_x", "tile_y")
            .collect()
        )
        w, h = img_src.image_dims(1)
        original = img_src.synth_pixels("img_000000000001", w, h)  # png, lossless
        rebuilt = np.zeros((h, w), dtype=np.uint16)
        ax, ay = img_src.scene_anchor(1)
        tile_m = tiling.TILE_PX * img_src.PIXEL_SIZE_M
        top = ay + h * 10.0
        for r in row:
            block = decode_image(bytes(r.data), "raw-u16", r.tile_w, r.tile_h)
            t_left, t_top = r.tile_x * tile_m, (r.tile_y + 1) * tile_m
            # image-pixel position of the fragment from tile key + in-tile offset
            gc = int(round((t_left - ax) / 10.0)) + r.off_x
            gr = int(round((top - t_top) / 10.0)) + r.off_y
            rebuilt[gr : gr + r.tile_h, gc : gc + r.tile_w] = block
        np.testing.assert_array_equal(rebuilt, original)

    def test_level_pixel_sums_cascade(self, tiles_df):
        # px_sum/px_cnt at level 1 equals the block-mean level pixels exactly
        agg = (
            tiles_df.groupBy("image_id", "level")
            .agg(F.sum("px_sum").alias("s"), F.sum("px_cnt").alias("c"))
            .collect()
        )
        by_key = {(r.image_id, r.level): (r.s, r.c) for r in agg}
        for i in (1, 2):  # png & jpeg images
            image_id = f"img_{i:012d}"
            w, h = img_src.image_dims(i)
            pix = img_src.synth_pixels(image_id, w, h)
            if img_src.image_fmt(i) == "jpeg":
                from data_model_spark.codecs import encode_image

                pix = decode_image(encode_image(pix, "jpeg"), "jpeg", w, h)
            s, c = by_key[(image_id, 0)]
            assert c == w * h
            assert s == pytest.approx(float(pix.astype(np.float64).sum()))
            if (image_id, 1) in by_key:
                lv1 = block_mean(pix, h // 2, w // 2).astype(np.uint16)
                s1, c1 = by_key[(image_id, 1)]
                assert c1 == lv1.size
                assert s1 == pytest.approx(float(lv1.astype(np.float64).sum()))


class TestMergeAndMetrics:
    def test_merge_tiles_canvas(self, tiles_df):
        merged = tiling.merge_tiles(tiles_df.filter("level = 0"))
        m = merged.toPandas()
        assert (m["filled_px"] <= tiling.TILE_PX**2).all()
        assert (m["n_sources"] >= 1).all()
        # every fragment accounted for
        assert m["px_cnt"].sum() == tiles_df.filter("level = 0").groupBy().sum("px_cnt").collect()[0][0]

    def test_metrics(self, tiles_df):
        m = tiling.tile_metrics(tiles_df).toPandas().set_index("level")
        assert m.loc[0, "n_images"] == N_IMAGES
        # pixel counts shrink ~4x per level
        if 1 in m.index:
            assert m.loc[1, "n_pixels"] < m.loc[0, "n_pixels"] / 3

    def test_point_query_prunes(self, tiles_df):
        ax, ay = img_src.scene_anchor(0)
        res = tiling.point_query(tiles_df, 0, ax + 5.0, ay + 5.0)
        rows = res.collect()
        assert any(r.image_id == "img_000000000000" for r in rows)


class TestPlanShape:
    def test_single_shuffle_and_range_partitioning(self, spark):
        fresh = img_src.generate_images_df(spark, 8, num_partitions=2)
        t = tiling.build_tiles(fresh, min_dimension=64)
        plan = t._jdf.queryExecution().executedPlan().toString()
        # exactly one exchange (the explicit repartitionByRange)
        assert plan.count("Exchange") == 1, plan
        assert "rangepartitioning" in plan.lower()

    def test_merge_reuses_partitioning(self, spark):
        fresh = img_src.generate_images_df(spark, 8, num_partitions=2)
        t = tiling.build_tiles(fresh, min_dimension=64)
        merged = tiling.merge_tiles(t)
        plan = merged._jdf.queryExecution().executedPlan().toString()
        # merge must not introduce a second shuffle on the same keys
        assert plan.count("Exchange") == 1, plan


class TestBboxQuery:
    def test_bbox_crop_matches_direct_geometry(self, spark):
        from data_model_spark.operators import tiling
        from data_model_spark.sources.images import generate_images_df

        images = generate_images_df(spark, 16)
        merged = tiling.merge_tiles(
            tiling.build_tiles(images, min_dimension=64, repartition=False)
        ).cache()
        x0, y0, x1, y1 = 600000.0, 5090000.0, 602560.0, 5092560.0
        got = tiling.bbox_query(merged, 0, x0, y0, x1, y1).toPandas()
        tile_m = tiling.TILE_PX * 10.0
        all_t = merged.filter("level = 0").toPandas()
        exp = all_t[
            (all_t.tile_x * tile_m < x1)
            & ((all_t.tile_x + 1) * tile_m > x0)
            & (all_t.tile_y * tile_m < y1)
            & ((all_t.tile_y + 1) * tile_m > y0)
        ]
        assert sorted(zip(got.tile_x, got.tile_y)) == sorted(
            zip(exp.tile_x, exp.tile_y)
        )
        assert len(got) > 0
        merged.unpersist()



class TestMergeDeterminism:
    def test_overlapping_fragments_compose_deterministically(self, spark):
        """Same-band scenes overlap (pairs (i, i+64) share a band and a grid
        column); the merged tile BYTES must be identical across runs — the
        sort pins the last-write-wins order by image_id."""
        from data_model_spark.operators import tiling
        from data_model_spark.sources.images import (
            IMAGE_SCHEMA,
            generate_images_pandas_for,
        )

        imgs = spark.createDataFrame(
            generate_images_pandas_for([6, 7, 8, 70, 71, 72]), IMAGE_SCHEMA
        ).repartition(6)

        def digest():
            rows = (
                tiling.merge_tiles(
                    tiling.build_tiles(imgs, min_dimension=64, repartition=False)
                )
                .select("var", "level", "tile_x", "tile_y", F.md5(F.col("data")).alias("d"))
                .collect()
            )
            return {(r.var, r.level, r.tile_x, r.tile_y): r.d for r in rows}

        a, b = digest(), digest()
        assert a == b and len(a) > 0


class TestCascadeExactness:
    def test_cascaded_levels_equal_direct_reduction(self):
        """The /2 sum-quad cascade must be BIT-identical to the direct
        native->level block mean (integer sums are exact in int64)."""
        from data_model_spark.functions import gridlib
        from data_model_spark.operators.downsample import downsample
        from data_model_spark.sources.images import synth_pixels

        decoded = synth_pixels("img_000000000042", 512, 512)
        recs = tiling.tiles_for_image("img_000000000042", decoded, 0.0, 5120.0)
        by_level = {}
        for r in recs:
            lv = by_level.setdefault(r["level"], [0.0, 0])
            lv[0] += r["px_sum"]
            lv[1] += r["px_cnt"]
        for lv in gridlib.overview_levels(512, 512, min_dimension=64):
            level, lw, lh = lv["level"], lv["width"], lv["height"]
            direct = (
                decoded if level == 0 else downsample(decoded, lh, lw, "b02")
            ).astype(np.float64)
            assert by_level[level][1] == lh * lw
            assert by_level[level][0] == direct.sum(), level
