"""Planted-neighbor ANN recall harness (VERDICT r4 #8).

A deterministic corpus with KNOWN nearest neighbors: 40 query vectors,
each with 5 planted neighbors at cosine ~0.9 (unit base + sigma=0.06
per-dim Gaussian noise, re-normalized), plus 300 unit-norm distractors
(expected cosine ~0 to everything).  Ground truth is the plant itself, so
recall is measured against construction — not against another engine.

Two consumers:

* ``ann_recall_planted`` (registered, oracle-backed): the multi-table
  hyperplane-LSH retrieval (L=6 tables x p=3 planes — the
  ``emb_neardup_lsh`` dial) ranked by exact cosine, reduced to per-query
  hit counts.  The DuckDB oracle is a sequential NumPy replay with
  IEEE-faithful fold order (projections and cosines accumulate
  left-to-right exactly like ``F.aggregate``), so a hash match proves the
  distributed bucket join + window rank equals the sequential kernel.
* ``tests/test_recall.py``: asserts the DOCUMENTED recall floors —
  LSH recall@5 >= 0.8 (measured ~1.0: at cosine 0.9 a 3-plane table
  agrees with prob (1-theta/pi)^3 ~ 0.63, so 6 tables miss with prob
  0.37^6 ~ 3e-3) and PQ ADC recall@5 >= 0.8 at m=8/ksub=16 (the r4
  m=4/k=8 setting measured 0.5 — the tuning note: recall rises with m
  and ksub because subquantizer cells shrink; multi-probe or re-ranking
  by exact distance are the orthogonal dials).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .registry import register
from .similarity import lsh_planes, multitable_signatures

NQ = 40  # queries
PER = 5  # planted neighbors per query
NDISTR = 300
DIM = 64
_NOISE = 0.06  # per-dim sigma -> expected cosine ~ 1/sqrt(1 + 0.06^2*64) ~ 0.9
_TABLES, _PLANES = 6, 3
_SEED = 42


def planted_corpus() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(query_ids, query_vecs, corpus_ids/owners, corpus_vecs).

    owner[i] = the query id a corpus vector was planted for, -1 for
    distractors.  Deterministic: PCG64(42).
    """
    rng = np.random.default_rng(_SEED)
    base = rng.normal(size=(NQ, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    ids, owners, vecs = [], [], []
    for q in range(NQ):
        for j in range(PER):
            v = base[q] + _NOISE * rng.normal(size=DIM)
            v /= np.linalg.norm(v)
            ids.append(1000 + q * PER + j)
            owners.append(q)
            vecs.append(v)
    d = rng.normal(size=(NDISTR, DIM))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    for i in range(NDISTR):
        ids.append(5000 + i)
        owners.append(-1)
        vecs.append(d[i])
    return (
        np.arange(NQ, dtype=np.int64),
        base,
        np.array(list(zip(ids, owners)), dtype=np.int64),
        np.array(vecs),
    )


_EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("owner", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), False),
    ]
)


def corpus_df(spark: SparkSession) -> DataFrame:
    _, _, id_owner, vecs = planted_corpus()
    rows = [
        (int(i), int(o), [float(x) for x in v])
        for (i, o), v in zip(id_owner, vecs)
    ]
    from ..sources.tables import local_df

    return local_df(spark, rows, _EMB_SCHEMA)


def queries_df(spark: SparkSession) -> DataFrame:
    qids, qvecs, _, _ = planted_corpus()
    rows = [
        (int(i), int(i), [float(x) for x in v]) for i, v in zip(qids, qvecs)
    ]
    from ..sources.tables import local_df

    return local_df(spark, rows, _EMB_SCHEMA)


def lsh_retrieve_topk(
    vectors: DataFrame, queries: DataFrame, k: int = PER
) -> DataFrame:
    """Multi-table LSH candidates -> exact-cosine top-k per query."""
    from .similarity import cosine_expr

    sig_v = multitable_signatures(vectors, _TABLES, _PLANES, DIM)
    sig_q = multitable_signatures(
        queries.select(F.col("vec_id").alias("query_id"), "embedding"),
        _TABLES,
        _PLANES,
        DIM,
    ).select("query_id", F.col("embedding").alias("q_emb"), "tbl", "bucket")
    cand = (
        sig_v.join(F.broadcast(sig_q), ["tbl", "bucket"])
        .select("query_id", "vec_id", "owner", "embedding", "q_emb")
        .distinct()
        .withColumn("cosine", F.round(cosine_expr("embedding", "q_emb"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "owner", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# sequential replay (fold-order-faithful) for the oracle
# ---------------------------------------------------------------------------


def _fold_dot(vecs: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Left-to-right accumulation, one element at a time — the exact IEEE
    order of ``F.aggregate(zip_with(e, c, *), 0.0, acc + x)``."""
    acc = np.zeros(vecs.shape[0])
    for i in range(vecs.shape[1]):
        acc = acc + vecs[:, i] * c[i]
    return acc


def _fold_sqnorm(vecs: np.ndarray) -> np.ndarray:
    acc = np.zeros(vecs.shape[0])
    for i in range(vecs.shape[1]):
        acc = acc + vecs[:, i] * vecs[:, i]
    return acc


def _round6(x: np.ndarray) -> np.ndarray:
    """HALF_UP (away from zero) to 6 decimals — Spark F.round / DuckDB."""
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6


def _buckets(vecs: np.ndarray, tbl: int) -> np.ndarray:
    planes = lsh_planes(_PLANES, DIM, seed=7 + tbl)
    b = np.zeros(vecs.shape[0], dtype=np.int64)
    for p in range(_PLANES):
        b += (_fold_dot(vecs, planes[p]) > 0).astype(np.int64) << p
    return b


def _replay_rows() -> list[tuple[int, int, float]]:
    """(query_id, n_hits, recall) per query — sequential kernel."""
    qids, qvecs, id_owner, vecs = planted_corpus()
    vb = np.stack([_buckets(vecs, t) for t in range(_TABLES)])
    qb = np.stack([_buckets(qvecs, t) for t in range(_TABLES)])
    vnorm = np.sqrt(_fold_sqnorm(vecs))
    rows = []
    for qi in range(NQ):
        cand = np.zeros(len(vecs), dtype=bool)
        for t in range(_TABLES):
            cand |= vb[t] == qb[t][qi]
        idx = np.flatnonzero(cand)
        qnorm = np.sqrt(_fold_sqnorm(qvecs[qi : qi + 1]))[0]
        cos = _round6(
            _fold_dot(vecs[idx], qvecs[qi]) / (vnorm[idx] * qnorm)
        )
        order = np.lexsort((id_owner[idx, 0], -cos))[:PER]
        hits = int((id_owner[idx[order], 1] == qi).sum())
        rows.append((qi, hits, round(hits / PER, 6)))
    return rows


def _recall_oracle() -> str:
    vals = ", ".join(f"({q}, {h}, {r!r})" for q, h, r in _replay_rows())
    return f"""
WITH v(query_id, n_hits, recall) AS (VALUES {vals})
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(n_hits AS BIGINT) AS n_hits,
       CAST(recall AS DOUBLE) AS recall
FROM v"""


@register("ann_recall_planted", _recall_oracle)
def ann_recall_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of multi-table LSH on the planted corpus —
    distributed retrieval hash-checked against the sequential replay;
    the >= 0.8 recall floor itself is asserted in tests/test_recall.py."""
    topk = lsh_retrieve_topk(corpus_df(spark), queries_df(spark), PER)
    return topk.groupBy("query_id").agg(
        F.sum((F.col("owner") == F.col("query_id")).cast("long")).alias("n_hits"),
        F.round(
            F.sum((F.col("owner") == F.col("query_id")).cast("long")) / PER, 6
        ).alias("recall"),
    )
