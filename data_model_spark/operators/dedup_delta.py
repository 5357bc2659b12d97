"""Incremental dedup: near-dup pairs touching ONLY the new batch.

Production corpora grow by deltas; re-running full-corpus dedup per
ingest is quadratic waste.  The incremental form scores only pairs with
at least one side in the delta: the delta's shingles semi-join the
corpus shingle index, so work scales with |delta| x overlap — never with
|corpus|^2.  (Delta-internal pairs are included: both sides new is still
"touching the delta".)

Implementation: the delta side of the shingle equi-join is the DELTA's
shingles only — corpus-internal (non-delta x non-delta) pairs are never
generated, not merely filtered out.  Two directed joins make every
delta-touching unordered pair appear exactly once per shared shingle:
delta x full with (delta_id < other_id), plus delta x NON-delta with
(other_id < delta_id) re-emitted in canonical order.  Pair counting,
size join, and threshold refine are then the standard exact-Jaccard
tail.

The fixture splits the corpus at doc_id 450: documents >= 450 are "the
new batch".  The oracle replays the same split with the all-pairs SQL
filtered to delta-touching pairs — so the driver check proves the
incremental path finds EXACTLY the pairs the full recompute would have
found for the delta, no more, no fewer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import shingles_df
from .registry import register

SPLIT = 450
THRESHOLD = 0.5


def dedup_delta_pairs(
    docs: DataFrame, delta_ids: DataFrame, threshold: float = THRESHOLD, n: int = 3
) -> DataFrame:
    """Exact Jaccard pairs (threshold) with >= 1 side in ``delta_ids``.

    ``delta_ids``: one column ``doc_id``.  Work scales with the delta's
    shingle mass, never with |corpus|^2.
    """
    # widen before the explosion (narrow single-file scans serialize it)
    # and persist: the shingle table feeds sizes, the delta semi/anti
    # splits AND the probe join — unpersisted it would re-explode per use
    from ..cache import track
    from ..sources.tables import widen

    sh = track(shingles_df(widen(docs), n))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    is_delta = delta_ids.select("doc_id").distinct()
    sh_delta = sh.join(is_delta, "doc_id", "left_semi")
    sh_old = sh.join(is_delta, "doc_id", "left_anti")
    a = sh_delta.select(F.col("doc_id").alias("da"), F.col("shingle"))
    # delta x full, delta id smaller; plus delta x OLD, old id smaller —
    # every delta-touching unordered pair meets exactly once per shingle
    p1 = a.join(
        sh.select(F.col("doc_id").alias("db"), "shingle"), "shingle"
    ).filter(F.col("da") < F.col("db")).select(
        F.col("da").alias("doc_a"), F.col("db").alias("doc_b")
    )
    p2 = a.join(
        sh_old.select(F.col("doc_id").alias("db"), "shingle"), "shingle"
    ).filter(F.col("db") < F.col("da")).select(
        F.col("db").alias("doc_a"), F.col("da").alias("doc_b")
    )
    inter = p1.unionByName(p2).groupBy("doc_a", "doc_b").agg(
        F.count("*").alias("inter")
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


_DELTA_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
  FROM documents
), sh AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
  FROM toks WHERE len(ws) >= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
             (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE (a.doc_id >= {SPLIT} OR b.doc_id >= {SPLIT})
  AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      (len(a.shingles) + len(b.shingles)
       - len(list_intersect(a.shingles, b.shingles))) >= {THRESHOLD}"""


@register("dedup_delta_pairs", _DELTA_ORACLE)
def dedup_delta_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs touching the doc_id >= 450 ingest batch, scored
    incrementally against the full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    delta = docs.filter(F.col("doc_id") >= SPLIT).select("doc_id")
    return dedup_delta_pairs(docs, delta)
