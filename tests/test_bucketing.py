"""Bucketed co-located joins plan shuffle-free (plans/bucketing.py)."""

import pytest
from pyspark.sql import functions as F

from data_model_spark.plans import bucketing


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS btest LOCATION '{loc}'")
    tiles = spark.range(0, 20000).select(
        (F.col("id") % 200).alias("tile_x"),
        (F.col("id") % 97).alias("tile_y"),
        F.col("id").alias("payload"),
    )
    meta = spark.range(0, 5000).select(
        (F.col("id") % 200).alias("tile_x"),
        (F.col("id") % 97).alias("tile_y"),
        (F.col("id") * 3).alias("attr"),
    )
    bucketing.write_bucketed(tiles, "btest.tiles_b", ["tile_x", "tile_y"], buckets=8)
    bucketing.write_bucketed(meta, "btest.meta_b", ["tile_x", "tile_y"], buckets=8)
    yield tiles, meta
    spark.sql("DROP DATABASE IF EXISTS btest CASCADE")


class TestBucketedJoin:
    def test_join_has_no_exchange(self, spark, bucketed_tables):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketing.bucketed_join(
                spark, "btest.tiles_b", "btest.meta_b", ["tile_x", "tile_y"]
            )
            bucketing.assert_no_exchange_on(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_join_result_matches_unbucketed(self, spark, bucketed_tables):
        tiles, meta = bucketed_tables
        got = bucketing.bucketed_join(
            spark, "btest.tiles_b", "btest.meta_b", ["tile_x", "tile_y"]
        ).count()
        exp = tiles.join(meta, ["tile_x", "tile_y"]).count()
        assert got == exp > 0

    def test_groupby_on_bucket_keys_has_no_exchange(self, spark, bucketed_tables):
        agg = (
            spark.table("btest.tiles_b")
            .groupBy("tile_x", "tile_y")
            .agg(F.sum("payload").alias("s"))
        )
        bucketing.assert_no_exchange_on(agg)

    def test_unbucketed_join_does_shuffle(self, spark, bucketed_tables):
        """Control: the same join off raw dataframes plans >= 1 Exchange."""
        tiles, meta = bucketed_tables
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            assert bucketing.count_exchanges(tiles.join(meta, ["tile_x", "tile_y"])) >= 1
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
