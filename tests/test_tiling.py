

def test_fused_generate_cut_matches_two_stage(spark):
    from data_model_spark.operators import tiling
    from data_model_spark.sources import images as img_src

    images = img_src.generate_images_df(spark, 6)
    fused = tiling.build_tiles(images, repartition=False)
    assert "MapInPandas" in fused._jdf.queryExecution().executedPlan().toString()
    # force the two-stage path by dropping the generator marker
    images2 = img_src.generate_images_df(spark, 6)
    del images2._dms_fixture_gen
    two = tiling.build_tiles(images2, repartition=False)
    key = lambda r: (r["image_id"], r["var"], r["level"], r["tile_x"], r["tile_y"], r["off_x"], r["off_y"])
    a = sorted(fused.collect(), key=key)
    b = sorted(two.collect(), key=key)
    assert len(a) == len(b) > 0
    for ra, rb in zip(a, b):
        assert ra == rb


def test_cached_images_keep_two_stage_plan(spark):
    from data_model_spark.operators import tiling
    from data_model_spark.sources import images as img_src

    images = img_src.generate_images_df(spark, 4).cache()
    try:
        plan = (
            tiling.build_tiles(images, repartition=False)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "InMemory" in plan  # reads the cache, not a re-generation
    finally:
        images.unpersist()
