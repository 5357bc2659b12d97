"""local_df must not leak defaultParallelism-sized task floods.

Arrow ``createDataFrame`` slices a pandas frame into ``defaultParallelism``
batches; for a 500-row dim table that schedules hundreds of near-empty
tasks through every downstream pandas-UDF stage.  ``local_df`` caps the
partition count at ``min(rows, spark.sql.shuffle.partitions)``.
"""

from data_model_spark.sources.tables import local_df


def test_local_df_partition_cap(spark):
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = local_df(spark, [(i, float(i)) for i in range(500)], "id LONG, v DOUBLE")
    assert df.rdd.getNumPartitions() <= width
    assert df.count() == 500
    # values survive the coalesce untouched
    assert sorted(r["id"] for r in df.collect()) == list(range(500))


def test_local_df_tiny_and_empty(spark):
    one = local_df(spark, [(1,)], "id LONG")
    assert one.rdd.getNumPartitions() == 1
    assert one.count() == 1
    empty = local_df(spark, [], "id LONG")
    assert empty.rdd.getNumPartitions() == 1
    assert empty.count() == 0
