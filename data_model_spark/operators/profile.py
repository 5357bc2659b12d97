"""Corpus profiling: per-stratum statistical summaries + vocabulary top-k.

The curation side of a training-data pipeline needs distribution facts
before it can pick thresholds: document-length quantiles per language,
token-frequency heads (boilerplate detection, stopword candidates).
Both are classic one-shuffle aggregations:

* ``length_profile`` — count / mean / exact interpolated p50-p90-p99 of
  ``n_chars`` per language.  Spark's ``percentile`` and DuckDB's
  ``quantile_cont`` implement the same linear interpolation over sorted
  values, and the inputs are int64, so rounded results match exactly.
  (``approx_percentile``/t-digest is the 100 TB drop-in — same plan
  shape, sketch mergeable map-side; the exact form stays the oracle.)
* ``vocab_topk`` — top-k tokens per language by document frequency,
  ties broken lexicographically.  explode -> two-level aggregation
  (map-side combine on (lang, token)) -> WindowGroupLimit rank, the
  same bounded-heap shape as ``stratified_topn``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


def length_profile(docs: DataFrame, stratum_col: str = "lang") -> DataFrame:
    probs = "array(0.5D, 0.9D, 0.99D)"
    return (
        docs.groupBy(stratum_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
            F.expr(f"percentile(n_chars, {probs})").alias("_q"),
        )
        .select(
            stratum_col,
            "n_docs",
            "mean_chars",
            F.round(F.col("_q")[0], 6).alias("p50"),
            F.round(F.col("_q")[1], 6).alias("p90"),
            F.round(F.col("_q")[2], 6).alias("p99"),
        )
    )


def vocab_topk(
    docs: DataFrame, k: int = 20, stratum_col: str = "lang"
) -> DataFrame:
    """Top-k tokens per stratum by document frequency (distinct docs)."""
    tok = docs.select(
        stratum_col,
        "doc_id",
        F.explode(F.array_distinct(F.split(F.trim("text"), " +"))).alias("token"),
    )
    freq = tok.groupBy(stratum_col, "token").agg(
        F.count("*").alias("df")
    )
    w = Window.partitionBy(stratum_col).orderBy(
        F.col("df").desc(), F.col("token")
    )
    return (
        freq.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(stratum_col, "token", "df", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "length_profile",
    """SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              ROUND(AVG(n_chars), 6) AS mean_chars,
              ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
              ROUND(quantile_cont(n_chars, 0.9), 6) AS p90,
              ROUND(quantile_cont(n_chars, 0.99), 6) AS p99
       FROM documents GROUP BY lang""",
)
def length_profile_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language doc-length distribution (exact interpolated quantiles)."""
    return length_profile(load_table(spark, sf_dir, "documents"))


@register(
    "vocab_topk",
    """SELECT lang, token, df, CAST(rk AS BIGINT) AS rk FROM (
  SELECT lang, token, df,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY df DESC, token) AS rk
  FROM (
    -- document frequency: one row per (doc, distinct token) by construction
    SELECT lang, token, COUNT(*) AS df FROM (
      SELECT lang, doc_id,
             unnest(list_distinct(string_split_regex(trim(text), ' +'))) AS token
      FROM documents) t
    GROUP BY lang, token) f) ranked WHERE rk <= 20""",
)
def vocab_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens per language by document frequency."""
    return vocab_topk(load_table(spark, sf_dir, "documents"), k=20)
