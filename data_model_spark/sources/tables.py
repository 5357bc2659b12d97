"""Table IO layer: testdata loading + Iceberg-or-parquet table semantics.

Iceberg's spark runtime jar is not fetchable in this sandbox (no network),
so the engine implements the table semantics it needs — append,
overwrite-by-filter (partition overwrite), existence probe — behind a thin
interface over partitioned Parquet with ``partitionOverwriteMode=dynamic``.
The engine code does not care which backing is active (SURVEY.md §7), and on
a real cluster this maps 1:1 onto ``df.writeTo(tbl).overwritePartitions()``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


class PartitionedTable:
    """Minimal Iceberg-like table: parquet + dynamic partition overwrite.

    ``overwrite_partitions`` is the transactional idempotent-write primitive
    the resume layer relies on (the parquet stand-in overwrites whole
    partition directories atomically enough for local semantics; on Iceberg
    this is a true atomic overwrite-by-filter).
    """

    def __init__(self, path: str, partition_cols: list[str]):
        self.path = path
        self.partition_cols = list(partition_cols)

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            not e.startswith("_") for e in os.listdir(self.path)
        )

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").partitionBy(*self.partition_cols).parquet(self.path)

    def overwrite_partitions(self, df: DataFrame) -> None:
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*self.partition_cols)
            .parquet(self.path)
        )

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)
