"""applyInPandasWithState tile merge: cross-micro-batch totals == batch job."""

import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import tiling
from data_model_spark.sources import images as img_src
from data_model_spark.sources.images import IMAGE_SCHEMA
from data_model_spark.streaming.stateful import merge_tiles_stateful


@pytest.fixture()
def split_images(spark, tmp_path):
    """Image table written as two parquet files -> two micro-batches.

    Scene pairs (6, 70) / (7, 71) are vertically adjacent in the same grid
    column and share a band (BANDS has period 16, the grid 64 columns), so
    fragments of the SAME (var, tile) key arrive in DIFFERENT micro-batches
    — the cross-batch accumulation the stateful operator exists for."""
    base = str(tmp_path / "imgs")
    for idx in ([6, 7, 8], [70, 71, 72]):
        pdf = img_src.generate_images_pandas_for(idx)
        spark.createDataFrame(pdf, IMAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(base)
    return base


def test_stateful_merge_matches_batch(spark, split_images, tmp_path):
    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(split_images)
    )
    frags = tiling.build_tiles(stream, min_dimension=64, repartition=False)
    # state-partition count is pinned by the first batch; 4 keeps the
    # HDFS-backed state store's per-partition commit cost test-sized
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            merge_tiles_stateful(frags, timeout_ms=None)
            .writeStream.trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("update")
            .format("memory")
            .queryName("merged_state")
            .start()
        )
        q.awaitTermination(180)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    # last update per key = the accumulated state across micro-batches
    updates = spark.sql(
        """SELECT var, level, tile_x, tile_y, n_sources, filled_px, px_sum, px_cnt FROM (
             SELECT *, row_number() OVER (
               PARTITION BY var, level, tile_x, tile_y
               ORDER BY n_sources DESC) AS rn
             FROM merged_state) WHERE rn = 1"""
    )
    got = {
        (r.var, r.level, r.tile_x, r.tile_y): (
            r.n_sources, r.filled_px, round(r.px_sum, 3), r.px_cnt
        )
        for r in updates.collect()
    }

    batch = tiling.merge_tiles(
        tiling.build_tiles(
            spark.read.parquet(split_images), min_dimension=64, repartition=False
        )
    )
    exp = {
        (r.var, r.level, r.tile_x, r.tile_y): (
            r.n_sources, r.filled_px, round(r.px_sum, 3), r.px_cnt
        )
        for r in batch.collect()
    }
    # filled_px is the footprint UNION (overlaps counted once), matching batch
    assert got == exp
    # at least one tile key must have accumulated across both micro-batches
    assert any(v[0] > 1 for v in got.values())


def test_timeout_eviction_emits_finals(spark, split_images, tmp_path):
    """Continuous mode: idle keys emit final=True rows and drop state."""
    import time

    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 2)
        .parquet(split_images)
    )
    frags = tiling.build_tiles(stream, min_dimension=64, repartition=False)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            merge_tiles_stateful(frags, timeout_ms=1500)
            .writeStream.trigger(processingTime="1 second")
            .option("checkpointLocation", str(tmp_path / "ckpt_t"))
            .outputMode("update")
            .format("memory")
            .queryName("merged_finals")
            .start()
        )
        finals = 0
        deadline = time.time() + 120
        while time.time() < deadline:
            finals = spark.sql(
                "SELECT count(*) FROM merged_finals WHERE final"
            ).collect()[0][0]
            if finals > 0:
                break
            time.sleep(2)
        q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert finals > 0  # idle keys were evicted with a final row
