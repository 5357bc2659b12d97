"""Dataset card: the one-row corpus report a release ships with.

Dataset releases (HF dataset cards, data statements) lead with a summary
block: corpus size, token mass, language/source spread, duplication
rate, PII exposure, quality profile.  This operator composes the
engine's cheap exact aggregates into that single row — every figure is a
column expression the corresponding dedicated query already verifies in
depth, so the card is one combinable aggregation pass over the corpus
(plus the PII projection), no joins, no Python.

Each ratio is a correctly-rounded double of exact integer counts
(ROUND(,6), HALF_UP in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .pii import EMAIL_RE, PHONE_RE, URL_RE, augment_with_pii
from .registry import register


def dataset_card(docs: DataFrame) -> DataFrame:
    """One row: sizes, spread, dup rate, PII exposure, quality profile."""
    aug = augment_with_pii(docs).select(
        "doc_id",
        (
            (F.size(F.regexp_extract_all("aug", F.lit(EMAIL_RE), F.lit(0))) > 0)
            | (F.size(F.regexp_extract_all("aug", F.lit(PHONE_RE), F.lit(0))) > 0)
            | (F.size(F.regexp_extract_all("aug", F.lit(URL_RE), F.lit(0))) > 0)
        )
        .cast("long")
        .alias("has_pii"),
    )
    base = docs.join(aug, "doc_id")
    n_tok = F.size(F.split(F.trim("text"), " +")).cast("long")
    punct = F.length(F.regexp_replace("text", "[a-z ]", "")).cast("long")
    return base.agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
        F.sum("has_pii").alias("n_pii_docs"),
        F.round(F.sum("has_pii") / F.count("*"), 6).alias("pii_rate"),
        F.round(F.sum(punct) / F.sum(F.length("text").cast("long")), 6).alias(
            "punct_ratio"
        ),
        F.round(F.sum(n_tok) / F.count("*"), 6).alias("mean_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


_CARD_ORACLE = f"""
WITH aug AS (
  SELECT doc_id, lang, source, text, n_chars,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' visit https://example.org/d/' || CAST(doc_id AS VARCHAR)
                 ELSE '' END AS augtext
  FROM documents
), flagged AS (
  SELECT *,
         CAST((len(regexp_extract_all(augtext, '{EMAIL_RE}')) > 0
               OR len(regexp_extract_all(augtext, '{PHONE_RE}')) > 0
               OR len(regexp_extract_all(augtext, '{URL_RE}')) > 0) AS BIGINT)
           AS has_pii,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tok,
         CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS BIGINT) AS punct
  FROM aug
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact_dups,
       CAST(SUM(has_pii) AS BIGINT) AS n_pii_docs,
       ROUND(CAST(SUM(has_pii) AS DOUBLE) / COUNT(*), 6) AS pii_rate,
       ROUND(CAST(SUM(punct) AS DOUBLE) / SUM(CAST(length(text) AS BIGINT)), 6)
         AS punct_ratio,
       ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS mean_tokens,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM flagged"""


@register("dataset_card", _CARD_ORACLE)
def dataset_card_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release summary row over the documents corpus."""
    return dataset_card(load_table(spark, sf_dir, "documents"))
