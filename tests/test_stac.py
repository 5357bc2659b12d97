"""STAC catalog items: column arithmetic equals the NumPy scene-grid
helpers, and the plan is a zero-shuffle scan projection."""

import numpy as np

from data_model_spark.operators.stac import stac_items
from data_model_spark.sources import images as img_src
from data_model_spark.sources.images import generate_images_df


def test_items_match_footprint_helpers(spark):
    rows = {r.image_id: r for r in stac_items(generate_images_df(spark, 40)).collect()}
    assert len(rows) == 40
    for i in [0, 1, 7, 31, 39]:
        image_id = f"img_{i:012d}"
        w, h = img_src.image_dims(i)
        fp = img_src.footprint_utm(image_id, w, h)
        r = rows[image_id]
        assert (r.bbox_minx, r.bbox_miny) == (int(fp[:, 0].min()), int(fp[:, 1].min()))
        assert (r.bbox_maxx, r.bbox_maxy) == (int(fp[:, 0].max()), int(fp[:, 1].max()))
        assert r.band == img_src.band_for(i)
        assert r.area_px == w * h
        assert r.item_id == f"{image_id}_{r.band}"


def test_tile_span_matches_cut(spark):
    """tiles_x * tiles_y == the number of distinct level-0 tiles the
    tiler actually produces for each scene."""
    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling

    images = generate_images_df(spark, 24)
    frags = tiling.build_tiles(images, repartition=False).filter(
        F.col("level") == 0
    )
    actual = {
        r.image_id: r.n
        for r in frags.groupBy("image_id")
        .agg(F.countDistinct("tile_x", "tile_y").alias("n"))
        .collect()
    }
    for r in stac_items(generate_images_df(spark, 24)).collect():
        assert r.tiles_x * r.tiles_y == actual[r.image_id]


def test_zero_shuffle_plan(spark):
    from data_model_spark.plans.bucketing import count_exchanges

    df = stac_items(generate_images_df(spark, 100))
    assert count_exchanges(df) == 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # item math is pure JVM columns
