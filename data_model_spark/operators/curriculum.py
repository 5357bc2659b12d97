"""Curriculum bucketing: quality-quantile stage assignment for training.

Curriculum-learning data loaders feed examples in quality order —
cleanest decile first, noisiest last.  The operator assigns every
document a decile (NTILE) of the engine's own quality score with a fully
deterministic order (score desc, doc_id), plus per-bucket aggregates the
loader schedule is built from (doc counts, token mass, score range).

NTILE semantics are identical in Spark and DuckDB (first ``n % 10``
buckets one row larger), so with a total order the assignment is
bit-reproducible.  Scale shape: the quality score is a narrow JVM
projection; NTILE needs a per-partition total order — here one global
window (fine for validation scale), at 10^12 rows the standard
substitute is range-bucketing on the score with exact per-range counts
(same outputs when bucket boundaries land between duplicate scores).
One shuffle either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

N_BUCKETS = 10

# composite score = token_density - punct_ratio, the two rounded heuristics
# of operators/text.py:quality_score composed (difference of two ROUND(,6)
# doubles -> deterministic in both engines)
QUALITY_SQL = """ROUND(
  ROUND(CAST(length(string_split_regex(trim(text), ' +')) AS DOUBLE)
        / (length(text) + 1), 6)
  - ROUND(CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
          / length(text), 6), 6)"""


def _quality_col():
    punct = F.round(
        F.length(F.regexp_replace("text", "[a-z ]", "")).cast("double")
        / F.length("text"),
        6,
    )
    density = F.round(
        F.size(F.split(F.trim("text"), " +")).cast("double")
        / (F.length("text") + 1),
        6,
    )
    return F.round(density - punct, 6)


def curriculum_buckets(docs: DataFrame) -> DataFrame:
    """Per-bucket loader schedule: (bucket, n_docs, tokens, best, worst)."""
    scored = docs.select(
        "doc_id",
        _quality_col().alias("quality"),
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n_tok"),
    )
    w = Window.orderBy(F.col("quality").desc(), "doc_id")
    return (
        scored.withColumn("bucket", F.ntile(N_BUCKETS).over(w))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
            F.max("quality").alias("best"),
            F.min("quality").alias("worst"),
        )
        .withColumn("bucket", F.col("bucket").cast("long"))
    )


def _oracle() -> str:
    return f"""
WITH scored AS (
  SELECT doc_id, {QUALITY_SQL} AS quality,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok
  FROM documents
), b AS (
  SELECT doc_id, quality, n_tok,
         NTILE({N_BUCKETS}) OVER (ORDER BY quality DESC, doc_id) AS bucket
  FROM scored)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tokens,
       MAX(quality) AS best, MIN(quality) AS worst
FROM b GROUP BY bucket"""


@register("curriculum_buckets", _oracle)
def curriculum_buckets_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-decile curriculum schedule over the documents table."""
    return curriculum_buckets(load_table(spark, sf_dir, "documents"))
