"""Bucketed co-located joins: pre-shuffle once, join shuffle-free forever.

At 100 TB the dominant cost of a repeated equi-join (tiles <-> scene
metadata, points <-> cell covers, fragments <-> checkpoint lineage) is
re-shuffling the big side on every query.  Spark's bucketed tables fix the
physical layout at WRITE time — ``bucketBy(n, keys)`` hash-partitions files
on disk — so any later join or aggregation on the bucket keys reads
co-located data and plans NO Exchange on that side (verified by
``assert_no_exchange_on``).

This is the Spark analogue of the reference pinning a zarr chunk grid once
at conversion time so every later reader window-aligns for free
(``conversion/geozarr.py`` chunk-grid setup): pay the layout cost once,
amortize across every downstream query.

Usage::

    write_bucketed(tiles, "tiles_b", ["tile_x", "tile_y"], buckets=256)
    write_bucketed(meta,  "meta_b",  ["tile_x", "tile_y"], buckets=256)
    joined = spark.table("tiles_b").join(spark.table("meta_b"), ["tile_x", "tile_y"])
    # .explain(): SortMergeJoin with NO Exchange on either side

Bucket-count guidance for the 1000-executor case: buckets >= total task
slots (so every slot gets work), and bucket_size ~ data / buckets <= a few
hundred MB (so one bucket sorts in memory).  Both sides MUST use the same
bucket count and key order for the exchange to be elidable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 64,
    sort: bool = True,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting inside buckets additionally elides the per-bucket Sort of a
    sort-merge join and gives parquet pages clustered min/max stats on the
    join keys.
    """
    writer = df.write.format(fmt).mode(mode).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str], how="inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed (AQE-final) plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # match every SHUFFLE exchange kind (hash, range, round-robin,
    # single-partition) but not BroadcastExchange — a broadcast-hash join is
    # exactly what the shuffle-free contract wants (and AQE may turn a small
    # bucketed SMJ into one at runtime)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange " in line and "BroadcastExchange" not in line
    )


def assert_no_exchange_on(df: DataFrame) -> None:
    """Raise if the physical plan still shuffles — the co-location contract."""
    n = count_exchanges(df)
    if n:
        raise AssertionError(
            f"expected a shuffle-free bucketed plan, found {n} Exchange(s):\n"
            + df._jdf.queryExecution().executedPlan().toString()
        )
