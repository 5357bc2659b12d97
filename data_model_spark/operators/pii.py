"""PII scrubbing stats — the redaction pass of a training-data pipeline.

Web corpora are scrubbed of emails / phone numbers / URLs before
training; the pipeline needs per-document match counts (for filtering
policies: "drop docs with > k PII hits") and the redacted text itself.
Everything here is JVM-side regexp column work — ``regexp_extract_all``
counts and chained ``regexp_replace`` redaction — no Python in the path,
so the pass is a pure narrow projection at 10^12 rows (no shuffle at
all; the only wide op a real run adds is the sink's own partitioning).

The synthetic corpus contains no PII, which would make the oracle
vacuous (the r3 lesson: an oracle that matches on zero hits checks
nothing).  Both engines therefore derive the SAME augmented column
first — deterministic contact strings appended by doc_id residue — and
scrub that.  Patterns stick to the regex intersection of Java
(``java.util.regex``) and RE2 (DuckDB): character classes, bounded
repetition, alternation; no lookaround, no backreferences.

Verdict column: ``red_fp`` is the md5 of the redacted text, so the check
pins the exact byte output of the redaction chain, not just the counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,4}"
PHONE_RE = "\\+1-555-[0-9]{4}"
URL_RE = "https://[a-z0-9./-]+"


def augment_with_pii(docs: DataFrame) -> DataFrame:
    """Deterministically append synthetic contact strings (fixture side)."""
    email = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    url = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" visit https://example.org/d/"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id", F.concat(F.col("text"), email, phone, url).alias("aug")
    )


def pii_scrub(docs: DataFrame, text_col: str = "aug") -> DataFrame:
    """Per-doc PII hit counts + redacted-text fingerprint (all JVM regexp)."""
    t = F.col(text_col)
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        URL_RE,
        "<URL>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(URL_RE), F.lit(0)))
        .cast("long")
        .alias("n_urls"),
        F.length(red).cast("long").alias("red_len"),
        F.md5(red).alias("red_fp"),
    )


def _sql_escape(pat: str) -> str:
    return pat.replace("'", "''")


_PII_ORACLE = f"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' visit https://example.org/d/' || CAST(doc_id AS VARCHAR)
                 ELSE '' END AS aug
  FROM documents
), red AS (
  SELECT doc_id, aug,
         regexp_replace(
           regexp_replace(
             regexp_replace(aug, '{_sql_escape(EMAIL_RE)}', '<EMAIL>', 'g'),
             '{_sql_escape(PHONE_RE)}', '<PHONE>', 'g'),
           '{_sql_escape(URL_RE)}', '<URL>', 'g') AS redacted
  FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{_sql_escape(EMAIL_RE)}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{_sql_escape(PHONE_RE)}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(aug, '{_sql_escape(URL_RE)}')) AS BIGINT) AS n_urls,
       CAST(length(redacted) AS BIGINT) AS red_len,
       md5(redacted) AS red_fp
FROM red"""


@register("pii_scrub_stats", _PII_ORACLE)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass over the (deterministically PII-augmented)
    documents table: per-doc hit counts + redacted-byte fingerprint."""
    docs = load_table(spark, sf_dir, "documents")
    return pii_scrub(augment_with_pii(docs))
