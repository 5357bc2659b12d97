"""Data Selection via Importance Resampling (DSIR) — hashed n-gram
importance weights for training-data curation.

Public method: Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023).  Each document is scored by the
log-likelihood ratio of two bag-of-hashed-bigrams unigram models — one
fit on a *target* corpus (here: the English slice, standing in for a
curated high-quality set), one on the *raw* corpus:

    score(doc) = sum over bigram occurrences b of
                 ln p_target(bucket(b)) - ln p_raw(bucket(b))

with add-one smoothing over ``n_buckets`` hashed feature buckets.
Resampling then keeps documents with probability proportional to
exp(score/T); here we emit the exact scores (the resampling step is the
already-shipped ``sampling.weighted_sample``).

Cross-engine exactness: buckets come from the md5_60 primitive
(operators/dedup.py:50), and each bucket's lambda quantizes to integer
NANONATS immediately after the transcendental (the ``operators/lm.py``
idiom), so the per-document sum is an order-free exact int64 — identical
at any parallelism and bit-equal to the DuckDB oracle.

Scale shape (100 TB): one bigram explode (pure JVM ``transform``), one
(doc, bucket) count aggregation (map-side combinable), one global
bucket-count aggregation bounded by ``n_buckets`` rows (broadcast back),
and one per-doc integer sum.  No Python UDFs, no driver-side data moves
beyond the fixed-size bucket table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.tables import load_table
from .dedup import md5_60
from .registry import register

N_BUCKETS = 1024
# lambda quantization: nanonats, matching lm.py / text.char_entropy
_LAM_Q = (
    "CAST(ROUND((LN((CAST(c_tgt AS DOUBLE) + 1.0) / (CAST(t_tgt AS DOUBLE) + {b}.0))"
    " - LN((CAST(c_raw AS DOUBLE) + 1.0) / (CAST(t_raw AS DOUBLE) + {b}.0))) * 1e9) AS BIGINT)"
)


def _bigram_occurrences(docs: DataFrame, target_col, n_buckets: int) -> DataFrame:
    """(doc_id, is_target, bucket) — one row per bigram occurrence."""
    ws = F.split(F.trim(F.lower("text")), " +")
    bg = F.explode(
        F.expr(
            "transform(sequence(1, size(ws)-1),"
            " i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))"
        )
    )
    return (
        docs.select("doc_id", target_col.alias("is_target"), ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select("doc_id", "is_target", bg.alias("bg"))
        .select("doc_id", "is_target", (md5_60(F.col("bg")) % n_buckets).alias("bucket"))
    )


def dsir_weights(
    docs: DataFrame, target_col=None, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """(doc_id, n_bigrams, dsir_nanonats) for every document with >= 2 tokens.

    ``target_col`` is a boolean Column marking target-corpus membership
    (default: ``lang = 'en'``).  Higher score = more target-like.
    """
    if target_col is None:
        target_col = F.col("lang") == "en"
    occ = _bigram_occurrences(docs, target_col, n_buckets)

    glob = occ.groupBy("bucket").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_tgt"),
    )
    tot = glob.agg(
        F.sum("c_raw").alias("t_raw"), F.sum("c_tgt").alias("t_tgt")
    )
    lam = (
        glob.crossJoin(F.broadcast(tot))
        .select("bucket", F.expr(_LAM_Q.format(b=n_buckets)).alias("lam_q"))
    )

    doc_b = occ.groupBy("doc_id", "bucket").agg(F.count("*").alias("occ"))
    return (
        doc_b.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("occ").alias("n_bigrams"),
            F.sum(F.col("occ") * F.col("lam_q")).alias("dsir_nanonats"),
        )
    )


_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split_regex(trim(lower(text)), ' +') AS ws
  FROM documents),
bg AS (
  SELECT doc_id, (lang = 'en') AS is_target,
         unnest(list_transform(generate_series(1, length(ws) - 1),
                               i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM toks WHERE length(ws) >= 2),
occ AS (
  SELECT doc_id, is_target,
         CAST('0x' || substr(md5(bg), 1, 15) AS BIGINT) % {N_BUCKETS} AS bucket
  FROM bg),
gb AS (
  SELECT bucket, COUNT(*) AS c_raw,
         SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
  FROM occ GROUP BY bucket),
tot AS (SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM gb),
lam AS (
  SELECT bucket, {_LAM_Q.format(b=N_BUCKETS)} AS lam_q
  FROM gb, tot),
docb AS (
  SELECT doc_id, bucket, COUNT(*) AS occ FROM occ GROUP BY 1, 2)
SELECT d.doc_id,
       CAST(SUM(d.occ) AS BIGINT) AS n_bigrams,
       CAST(SUM(d.occ * l.lam_q) AS BIGINT) AS dsir_nanonats
FROM docb d JOIN lam l USING (bucket)
GROUP BY d.doc_id
"""


@register("dsir_weights", _DSIR_ORACLE)
def dsir_weights_query(spark, sf_dir):
    """DSIR importance scores over the full corpus, target = English slice.

    The oracle replays bucket hashing, both smoothed models, and the
    nanonat quantization with the identical expression tree, so the match
    is bit-exact (order-free integer sums), not approximate.
    """
    return dsir_weights(load_table(spark, sf_dir, "documents"))
