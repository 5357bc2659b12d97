"""Exact equi-depth range boundaries — the sampling-free range planner.

``repartitionByRange`` picks boundaries with a SAMPLING JOB — measured
on this pipeline as the write phase's non-scaler (see
``plans/partitioning.py:spatial_block_partition``).  When the layout is
planned AHEAD of the write (a catalog maintenance job), the boundaries
can be EXACT instead: NTILE over the total order (value, id) gives B
equal-depth buckets, and each bucket's max value is the range split
point.  Stored with the table, these boundaries make every subsequent
write a deterministic one-exchange repartition — no sampling job, no
run-to-run boundary jitter.

This query computes the 32-way boundaries of the documents length
distribution: (bucket, n_rows, lo, hi) — ``hi`` is the split point.
Deterministic: NTILE semantics (first ``n % B`` buckets one row larger)
and the total order match bit-for-bit across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

B = 32


def range_boundaries(
    df: DataFrame, value_col: str = "n_chars", id_col: str = "doc_id"
) -> DataFrame:
    """(bucket, n_rows, lo, hi): exact B-way equi-depth split points."""
    w = Window.orderBy(value_col, id_col)
    return (
        df.select(id_col, value_col)
        .withColumn("bucket", F.ntile(B).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
        .withColumn("bucket", F.col("bucket").cast("long"))
    )


_BOUNDS_ORACLE = f"""
WITH b AS (
  SELECT doc_id, n_chars,
         NTILE({B}) OVER (ORDER BY n_chars, doc_id) AS bucket
  FROM documents)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(n_chars) AS lo, MAX(n_chars) AS hi
FROM b GROUP BY bucket"""


@register("range_boundaries", _BOUNDS_ORACLE)
def range_boundaries_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 32-way equi-depth boundaries of the document length
    distribution (the pre-planned substitute for range-partition
    sampling)."""
    return range_boundaries(load_table(spark, sf_dir, "documents"))
