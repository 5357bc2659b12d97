"""Dedup QA: precision/recall of the LSH candidate stage vs exact truth.

A production near-dup pipeline must MEASURE its candidate generator:
banding parameters (k hashes, b bands) trade recall against candidate
volume, and the tuning loop needs (precision, recall) of the raw LSH
candidate set against the exact-Jaccard pair set — on a sample at 10^12
scale, exhaustively at validation scale.  This operator computes both
sets with the engine's own building blocks (``dedup.shingles_df`` →
``minhash_signatures`` → ``lsh_candidates``; exact ``jaccard_pairs``)
over one shared, cached shingle explosion, full-outer-joins them, and
reduces to a single QA row.

The entire pipeline — 64 affine minhashes, 16-band bucketing, candidate
join, exact refinement, and the PR arithmetic — is replayed bit-for-bit
in the DuckDB oracle (the ``md5_60`` cross-engine hash primitive), so
the driver check covers the banding recall itself: a wrong band count or
a broken bucket key shifts tp/fn and the hash mismatches.

Ratios are correctly-rounded doubles of exact integer counts, rounded
HALF_UP at 6 decimals in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import (
    MD5_60_SQL,
    jaccard_pairs,
    lsh_candidates,
    minhash_params,
    minhash_signatures,
    shingles_df,
)
from .dedup import _persist
from .registry import register

THRESHOLD = 0.5


def lsh_pr_stats(
    docs: DataFrame,
    threshold: float = THRESHOLD,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
) -> DataFrame:
    """One QA row: candidate volume, truth volume, tp/fp/fn, precision,
    recall of the raw LSH candidate set against exact Jaccard pairs."""
    n_docs = docs.count()
    sh = shingles_df(docs, n)
    if not sh.is_cached:
        sh = _persist(sh)  # feeds signatures AND the exact truth join
    from .dedup import _band_pairs, minhash_band_hashes

    cand = _band_pairs(
        minhash_band_hashes(sh, num_hashes, bands), n_docs=n_docs
    ).withColumn("c", F.lit(1))
    truth = (
        jaccard_pairs(docs, threshold, n, shingles=sh, n_docs=n_docs)
        .select("doc_a", "doc_b")
        .withColumn("t", F.lit(1))
    )
    j = cand.join(truth, ["doc_a", "doc_b"], "full")
    agg = j.agg(
        F.sum("c").cast("long").alias("n_cand"),
        F.sum("t").cast("long").alias("n_truth"),
        F.sum(
            (F.col("c").isNotNull() & F.col("t").isNotNull()).cast("long")
        ).alias("tp"),
        F.sum(
            (F.col("c").isNotNull() & F.col("t").isNull()).cast("long")
        ).alias("fp"),
        F.sum(
            (F.col("c").isNull() & F.col("t").isNotNull()).cast("long")
        ).alias("fn"),
    )
    return agg.select(
        "n_cand",
        "n_truth",
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / F.col("n_cand"), 6).alias("precision"),
        F.round(F.col("tp") / F.col("n_truth"), 6).alias("recall"),
    )


def _pr_oracle() -> str:
    vals = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_params(64, 42))
    )
    h = MD5_60_SQL.format(col="shingle")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
  FROM documents WHERE doc_id < 500),
shl AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
  FROM toks WHERE len(ws) >= 3),
sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM shl),
xs AS (SELECT doc_id, {h} % 2147483647 AS x FROM sh),
params(hash_id, a, b) AS (VALUES {vals}),
sig AS (
  SELECT doc_id, hash_id,
         MIN((CAST(a AS BIGINT) * x + CAST(b AS BIGINT)) % 2147483647) AS minhash
  FROM xs CROSS JOIN params GROUP BY doc_id, hash_id),
bands AS (
  SELECT doc_id, hash_id % 16 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_id)) AS bh
  FROM sig GROUP BY doc_id, hash_id % 16),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
truth AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM shl a JOIN shl b ON a.doc_id < b.doc_id
  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))) >= {THRESHOLD}),
j AS (
  SELECT COALESCE(c.doc_a, t.doc_a) AS doc_a,
         COALESCE(c.doc_b, t.doc_b) AS doc_b,
         (c.doc_a IS NOT NULL) AS in_c, (t.doc_a IS NOT NULL) AS in_t
  FROM cand c FULL JOIN truth t
    ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
agg AS (
  SELECT CAST(SUM(CASE WHEN in_c THEN 1 END) AS BIGINT) AS n_cand,
         CAST(SUM(CASE WHEN in_t THEN 1 END) AS BIGINT) AS n_truth,
         CAST(SUM(CASE WHEN in_c AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN in_c AND NOT in_t THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN NOT in_c AND in_t THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM j)
SELECT n_cand, n_truth, tp, fp, fn,
       ROUND(CAST(tp AS DOUBLE) / n_cand, 6) AS precision,
       ROUND(CAST(tp AS DOUBLE) / n_truth, 6) AS recall
FROM agg"""


@register("lsh_pr_stats", _pr_oracle)
def lsh_pr_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-LSH-candidate precision/recall vs exact 3-gram Jaccard truth
    (threshold 0.5) over the full sf0.01 corpus window."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return lsh_pr_stats(docs)
