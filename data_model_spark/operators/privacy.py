"""k-anonymity audit over quasi-identifier combinations.

Training-data releases carry re-identification risk through
quasi-identifier (QI) combinations — attributes that are individually
harmless but jointly near-unique.  The standard audit: group the corpus
by the QI tuple and surface every group smaller than k (those documents
are k-anonymity violations), plus the risk mass they represent.

QI tuple here: (lang, source, length bucket) — the release-visible
metadata of the documents table; the length bucket quantizes ``n_chars``
at 256 chars (integer division, non-negative, identical in both
engines).

Scale shape: ONE combinable count aggregation on the QI key (map-side
partial counts), then a broadcast-size filter — the audit costs one
shuffle of |distinct QI tuples| rows at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

K = 5
LEN_BUCKET = 256


def k_anonymity_violations(docs: DataFrame, k: int = K) -> DataFrame:
    """(lang, source, len_bucket, group_n) for every QI group with < k
    members — the rows a privacy gate would block or generalize."""
    groups = docs.groupBy(
        "lang",
        "source",
        F.expr(f"n_chars div {LEN_BUCKET}").alias("len_bucket"),
    ).agg(F.count("*").alias("group_n"))
    return groups.filter(F.col("group_n") < k)


_KANON_ORACLE = f"""
SELECT lang, source, n_chars // {LEN_BUCKET} AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS group_n
FROM documents
GROUP BY 1, 2, 3
HAVING COUNT(*) < {K}"""


@register("k_anonymity_audit", _KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QI groups below k=5 over (lang, source, 256-char length bucket)."""
    return k_anonymity_violations(load_table(spark, sf_dir, "documents"))
