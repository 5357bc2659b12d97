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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Small in-memory dimension table as a JVM ``LocalTableScan``.

    ``spark.createDataFrame(list_of_tuples)`` pickles rows into a Python RDD
    that re-runs Python workers on *every* action; routing through pandas
    takes the Arrow path instead, so the relation lives JVM-side and costs
    nothing per action.  Always use this for literal dim tables.

    ``rows``: list of tuples (possibly empty) or a pandas DataFrame.
    ``schema``: DDL string or StructType (required — empty input has no
    inferable types).
    """
    if isinstance(rows, pd.DataFrame):
        pdf = rows
    else:
        names = (
            [f.name for f in schema.fields]
            if hasattr(schema, "fields")
            else [c.strip().split()[0] for c in _split_ddl(schema)]
        )
        pdf = pd.DataFrame(list(rows), columns=names)
    out = spark.createDataFrame(pdf, schema)
    # Arrow createDataFrame slices the frame into ``defaultParallelism``
    # batches (sized for billion-row generators), so a 500-row dim table
    # executes as 256 near-empty tasks through every downstream pandas-UDF
    # stage — the same tiny-task flood ``fixture_range`` fixes for
    # spark.range.  Coalesce (narrow, no shuffle) to one waveful of tasks;
    # coalesce never *increases* partitions, so large frames are untouched.
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return out.coalesce(max(1, min(len(pdf), width)))


def fixture_range(spark: SparkSession, start, end=None) -> DataFrame:
    """``spark.range`` sized for FIXTURE-scale inputs (hundreds to a few
    thousand rows feeding per-row pandas kernels).

    PySpark's ``spark.range`` defaults to ``spark.default.parallelism``
    partitions — tuned session-side for billion-row generators (8 tasks
    per core), which turns a 200-row fixture into hundreds of near-empty
    tasks whose scheduling dominates the query.  Here the partition count
    is ``min(n, spark.sql.shuffle.partitions)``: one waveful of tasks,
    each with real work, and the same knob that scales the session on a
    real cluster.
    """
    if end is None:
        start, end = 0, start
    n = max(int(end) - int(start), 1)
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return spark.range(start, end, numPartitions=max(1, min(n, width)))


def widen(df: DataFrame, width: int | None = None) -> DataFrame:
    """Raise a narrow source's parallelism before fan-out compute.

    Single-row-group parquet files scan as ONE partition no matter the
    split config, so a broadcast-joined candidate explosion downstream
    runs on one core (measured: the whole 10^8-candidate geostats refine
    serialized).  When the current plan has fewer partitions than the
    session's shuffle width, insert one round-robin repartition of the
    narrow rows; sources that are already wide (real multi-file tables at
    scale) pass through untouched, so no redundant shuffle at cluster
    scale.
    """
    spark = df.sparkSession
    if width is None:
        width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() < width:
        return df.repartition(width)
    return df


def _split_ddl(ddl: str) -> list[str]:
    """Split a DDL column list on top-level commas (ARRAY<..> safe)."""
    out, depth, cur = [], 0, []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out

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


def _is_local_path(path: str) -> bool:
    from urllib.parse import urlparse

    return urlparse(path).scheme in ("", "file")


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for ``path`` via the JVM Hadoop API.

    Works for every scheme the session's Hadoop conf supports (file://,
    s3a://, hdfs://, ...) — the only safe way to mutate table storage that
    might not be a local directory.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


class PartitionedTable:
    """Minimal Iceberg-like table: parquet + dynamic partition overwrite.

    ``overwrite_partitions`` is the transactional idempotent-write primitive
    the resume layer relies on (the parquet stand-in overwrites whole
    partition directories atomically enough for local semantics; on Iceberg
    this is a true atomic overwrite-by-filter).

    Storage mutations (``exists``/``delete_partition``) route through the
    Hadoop FileSystem API when a SparkSession is available, so s3a:// and
    hdfs:// table paths behave identically to local ones; the local-only
    fallback raises on non-local schemes instead of silently no-opping.
    """

    def __init__(self, path: str, partition_cols: list[str]):
        self.path = path
        self.partition_cols = list(partition_cols)

    def _spark(self) -> SparkSession | None:
        return SparkSession.getActiveSession()

    def exists(self) -> bool:
        spark = self._spark()
        if spark is not None:
            fs, hpath = _hadoop_fs(spark, self.path)
            if not fs.exists(hpath):
                return False
            return any(
                not st.getPath().getName().startswith("_")
                for st in fs.listStatus(hpath)
            )
        if not _is_local_path(self.path):
            raise RuntimeError(
                f"no active SparkSession to probe non-local table path {self.path!r}"
            )
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

    def delete_partition(self, **values) -> None:
        """Drop a partition directory (Iceberg: delete-by-filter).

        Dynamic partition overwrite of an EMPTY DataFrame is a no-op (only
        partitions present in the data are replaced), so emptying a
        partition needs an explicit delete.  The resume layer's empty-unit
        checkpoint depends on this actually removing committed rows, so the
        delete must work — or fail loudly — for ANY storage scheme.
        """
        sub = "/".join(f"{k}={v}" for k, v in values.items())
        full = self.path.rstrip("/") + "/" + sub
        spark = self._spark()
        if spark is not None:
            fs, hpath = _hadoop_fs(spark, full)
            if fs.exists(hpath):
                fs.delete(hpath, True)
            return
        if not _is_local_path(full):
            raise RuntimeError(
                f"no active SparkSession to delete non-local partition {full!r}"
            )
        import shutil

        shutil.rmtree(full, ignore_errors=True)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)
