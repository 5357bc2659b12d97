"""Source-level content similarity: exact shingle-set Jaccard per pair.

Corpus governance needs the SOURCE-granular complement of the per-doc
near-dup suite: which ingestion sources substantially overlap (mirrors,
re-crawls, syndication) — the matrix that drives source-level dedup
decisions before any per-document work.  W1 drift
(``operators/drift.py``) compares VALUE distributions; this operator
compares CONTENT SETS: exact Jaccard of each source's distinct 3-gram
shingle set.

Scale shape: per-doc shingles (the cached explosion of the dedup suite)
reduce to DISTINCT (source, shingle) — the heavy step, one hash
aggregation whose output is bounded by vocabulary, not corpus;
intersections come from ONE shingle self-equi-join (sources per shingle
<= |sources|, so the key is provably unskewed); sizes broadcast.  Output
is |sources|^2/2 rows — tiny at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import shingles_df
from .registry import register


def source_similarity(docs: DataFrame, n: int = 3) -> DataFrame:
    """(source_a, source_b, inter, na, nb, jaccard) for overlapping pairs."""
    sh = (
        shingles_df(docs.select("doc_id", "text"), n)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    sizes = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "inter",
            "na",
            "nb",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )


_SOURCE_SIM_ORACLE = """
WITH toks AS (
  SELECT doc_id, source, string_split_regex(trim(text), ' +') AS ws
  FROM documents),
per_doc AS (
  SELECT doc_id, source,
         unnest(list_distinct(list_transform(generate_series(1, len(ws)-2),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS shingle
  FROM toks WHERE len(ws) >= 3),
sh AS (SELECT DISTINCT source, shingle FROM per_doc),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(COUNT(*) AS BIGINT) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2)
SELECT i.source_a, i.source_b, i.inter, sa.n_sh AS na, sb.n_sh AS nb,
       ROUND(CAST(i.inter AS DOUBLE) / (sa.n_sh + sb.n_sh - i.inter), 6)
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b"""


@register("source_similarity", _SOURCE_SIM_ORACLE)
def source_similarity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise shingle-set Jaccard between the 20 document sources."""
    return source_similarity(load_table(spark, sf_dir, "documents"))
