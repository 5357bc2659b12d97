"""Contrastive-training data ops: quantized-retrieval QA + hard negatives.

Two first-class operators a large-scale embedding-training pipeline needs
beyond raw ANN search (both oracle-backed):

* ``quantized_recall`` — retrieval QA for coarse embedding quantization:
  quantize each query vector to a fixed lattice (half-unit steps, HALF-UP
  via ``floor(2x + 0.5)/2`` so Spark, DuckDB and the NumPy replay agree
  bit-for-bit) and measure, per query, the rank of its own full-precision
  counterpart in the corpus.  The rank is derived WITHOUT sorting: it is
  ``1 + count(rows that beat the true pair)`` under the deterministic
  ordering (cosine DESC, vec_id ASC), a single conditional aggregation —
  at 10^12 corpus rows that is one broadcast join + one map-side-combining
  groupBy, no window, no global sort.
* ``hard_negatives`` — hard-negative mining for contrastive training: for
  each anchor, the top-k nearest-by-cosine candidates whose ``label``
  differs from the anchor's (nearest wrong-class neighbors).  Anchor set is
  bounded and broadcast; ranking is a per-anchor window whose ``rank <= k``
  filter Spark pushes into ``WindowGroupLimit`` (partial top-k before the
  shuffle), so corpus-side traffic is k rows per (partition, anchor).

Cosines are ROUNDed to 6 decimals before any comparison or threshold in
BOTH engines (the established convention of ``similarity.py``: raw doubles
can differ by an ulp across engines from fold order; the rounded value is
the portable one and ranking ties break on vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register
from .similarity import _as_double, cosine_expr


def _quantize_expr(col: str):
    """Half-unit lattice quantization, HALF-UP: floor(2x + 0.5) / 2.

    ``floor`` (exact in IEEE, identical in Spark / DuckDB / NumPy) instead
    of ``round`` because Python/NumPy round() is half-to-even while Spark
    F.round and DuckDB ROUND are HALF_UP — the floor form is one shared
    definition all three compute identically.
    """
    return F.transform(
        _as_double(col),
        lambda x: F.floor(x * F.lit(2.0) + F.lit(0.5)).cast("double") / F.lit(2.0),
    )


def quantized_retrieval_ranks(
    corpus: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Per-query rank of the true (full-precision) pair under quantized query.

    ``corpus``/``queries``: (vec_id, embedding).  Returns one row per query:
    (query_id, true_cos, true_rank, hit_at_k).  Queries with an all-zero
    quantized vector (cosine undefined) are dropped in both engines.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_full"),
        _quantize_expr("embedding").alias("qv"),
    ).filter(
        F.aggregate(F.col("qv"), F.lit(0.0), lambda a, x: a + x * x) > 0
    )
    # the query's own full-precision vector IS the true pair: its cosine
    # against the quantized query needs no join to compute
    q = q.withColumn("true_cos", F.round(cosine_expr("q_full", "qv"), 6)).drop(
        "q_full"
    )
    joined = corpus.select("vec_id", "embedding").crossJoin(F.broadcast(q))
    cos = F.round(cosine_expr("embedding", "qv"), 6)
    beats = (cos > F.col("true_cos")) | (
        (cos == F.col("true_cos")) & (F.col("vec_id") < F.col("query_id"))
    )
    ranked = joined.groupBy("query_id", "true_cos").agg(
        (F.lit(1) + F.sum(beats.cast("long"))).cast("long").alias("true_rank")
    )
    return ranked.withColumn(
        f"hit_at_{k}", (F.col("true_rank") <= k).cast("long")
    )


_QUANTIZED_RECALL_ORACLE = """
WITH q AS (
  SELECT vec_id AS query_id,
         embedding::DOUBLE[] AS q_full,
         list_transform(embedding::DOUBLE[],
                        x -> FLOOR(x * 2.0 + 0.5) / 2.0) AS qv
  FROM embeddings WHERE vec_id < 200
), qn AS (
  SELECT query_id,
         ROUND(list_cosine_similarity(q_full, qv), 6) AS true_cos,
         qv
  FROM q
  WHERE list_aggregate(list_transform(qv, x -> x * x), 'sum') > 0
), s AS (
  SELECT qn.query_id, qn.true_cos, e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], qn.qv), 6) AS cos
  FROM qn, embeddings e
), r AS (
  SELECT query_id, true_cos,
         1 + SUM(CASE WHEN cos > true_cos
                        OR (cos = true_cos AND vec_id < query_id)
                      THEN 1 ELSE 0 END) AS rnk
  FROM s GROUP BY query_id, true_cos
)
SELECT query_id, true_cos, CAST(rnk AS BIGINT) AS true_rank,
       CAST(rnk <= 5 AS BIGINT) AS hit_at_5
FROM r
"""


@register("quantized_recall", _QUANTIZED_RECALL_ORACLE)
def quantized_recall(spark, sf_dir):
    """Half-unit-quantized query retrieval QA over the embeddings table.

    200 queries (vec_id < 200) against the full corpus.  Non-vacuous at
    sf0.01: the half-unit lattice is coarse enough that ~11% of true pairs
    drop out of rank 1 and a few out of the top 5 (max observed rank 14).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return quantized_retrieval_ranks(
        emb, emb.filter(F.col("vec_id") < 200), k=5
    )


def hard_negative_pairs(
    corpus: DataFrame, anchors: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k nearest wrong-label candidates per anchor (hard negatives)."""
    a = anchors.select(
        F.col("vec_id").alias("anchor_id"),
        F.col("embedding").alias("a_emb"),
        F.col("label").alias("a_label"),
    )
    cand = corpus.select("vec_id", "embedding", "label")
    joined = cand.crossJoin(F.broadcast(a)).filter(
        F.col("label") != F.col("a_label")
    )
    joined = joined.withColumn(
        "cosine", F.round(cosine_expr("embedding", "a_emb"), 6)
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(
            "anchor_id",
            F.col("vec_id").alias("neg_id"),
            "cosine",
            F.col("neg_rank").cast("long").alias("neg_rank"),
        )
    )


_HARD_NEGATIVES_ORACLE = """
WITH a AS (
  SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS ae, label AS al
  FROM embeddings WHERE vec_id < 50
), s AS (
  SELECT a.anchor_id, e.vec_id AS neg_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], a.ae), 6)
           AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY a.anchor_id
           ORDER BY ROUND(list_cosine_similarity(e.embedding::DOUBLE[],
                                                 a.ae), 6) DESC,
                    e.vec_id
         ) AS rnk
  FROM a JOIN embeddings e ON e.label <> a.al
)
SELECT anchor_id, neg_id, cosine, CAST(rnk AS BIGINT) AS neg_rank
FROM s WHERE rnk <= 3
"""


@register("hard_negatives", _HARD_NEGATIVES_ORACLE)
def hard_negatives(spark, sf_dir):
    """Top-3 nearest wrong-label neighbors for 50 anchors (vec_id < 50)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return hard_negative_pairs(emb, emb.filter(F.col("vec_id") < 50), k=3)
