"""IVF coarse quantizer trained with Lloyd's k-means — exactly, cross-engine.

``operators/similarity.py`` ships an IVF variant with seeded (untrained)
centroids; this module adds the real thing: k-means trained on a sample,
then full-corpus assignment — the standard IVF build for ANN indexes over
an embedding column (reference has no ANN surface; this is part of the
LLM-data-pipeline layer, SURVEY.md "similarity search").

The interesting problem is making an ITERATIVE float algorithm
oracle-checkable.  Float k-means is not reproducible across engines (a
centroid is a mean — partial-sum order changes the ulps, and one flipped
argmin cascades).  So every quantity here is an integer:

* embeddings are quantized once: ``xq[i] = floor(x[i] * 1024 + 0.5)``
  (both engines floor identically; float32 inputs scale exactly in double);
* a centroid is kept as the exact rational ``(sum_vector, count)`` — sums
  of int64 are associative, so Spark's partition order cannot change them;
* nearest-centroid uses the count-normalized key
  ``key(x, c) = (||s_c||^2 - 2 * n_c * (x . s_c)) / n_c^2``, which orders
  centroids exactly like the true squared distance to the mean
  ``||x - s_c/n_c||^2`` (drop the per-x constant ``||x||^2``, divide the
  exact-int64 remainder by ``n_c^2``).  The numerator is exact int64 and
  below 2^53: |numerator| <= 192 * n^2 * Q^2 with dim 64 and |xq| <= Q
  (~2600 here), i.e. ~8.5e13 at n = 256 — exact while the training-sample
  size n stays <= ~2600, which ``ivf_kmeans_assign`` asserts (the bound is
  a public contract of ``sample_max_id``, not an internal detail), so
  the double division is the identical correctly-rounded IEEE value in
  Spark, DuckDB, and NumPy; ties break by cent_id.  (An earlier revision
  compared the un-normalized ``sum_i (n_c * xq[i] - s_c[i])^2`` =
  ``n_c^2 * dist^2`` across centroids, which weights each candidate by its
  population squared — at sf0.01 that collapsed all 500 vectors into one
  cell.  Both engines shared the bias so the oracle still matched; the
  normalized key is what makes the operator actual k-means.);
* Lloyd's iterations run a FIXED count (no float convergence test), and an
  emptied cell keeps its previous (sum, count).

Result: 3 unrolled iterations in DuckDB SQL reproduce the Spark training
bit-for-bit — candidate assignment AND the trained centroids.

Scale shape: training touches only the sample (driver holds k*(dim+1)
integers between iterations — the same O(metadata) collect budget as the
resume loop); full-corpus assignment is one broadcast join of a k-row
centroid table against the vector table, embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, local_df
from .registry import register

QUANT_SCALE = 1024
DIM = 64


def quantize(vectors: DataFrame, dim: int = DIM) -> DataFrame:
    """Add ``xq``: the embedding quantized to exact int64 components."""
    return vectors.withColumn(
        "xq",
        F.expr(
            f"transform(cast(embedding as array<double>), "
            f"v -> cast(floor(v * {QUANT_SCALE}.0 + 0.5) as bigint))"
        ),
    )


def _dist_key_expr():
    """Count-normalized nearest-centroid key for a row (s ARRAY<BIGINT>, n BIGINT).

    ``(||s||^2 - 2 * n * (xq . s)) / n^2`` — same order as the true squared
    distance to the mean s/n; exact-int64 numerator (< 2^53), identical
    IEEE division cross-engine.
    """
    # vectorized pandas kernel for the former interpreted HOF folds: all
    # arithmetic is exact int64 (numerator < 2^53, asserted by the design
    # note above), so the result is identical regardless of fold order;
    # the final division replays the same cast-to-double sequence
    @F.pandas_udf("double")
    def _dk(sx: pd.Series, ss_: pd.Series, sn: pd.Series) -> pd.Series:
        n_rows = len(sx)
        if n_rows == 0:
            return pd.Series([], dtype="float64")
        X = np.stack(sx.to_numpy()).astype(np.int64, copy=False)
        S = np.stack(ss_.to_numpy()).astype(np.int64, copy=False)
        n = sn.to_numpy().astype(np.int64)
        dot = (X * S).sum(axis=1)
        ss = (S * S).sum(axis=1)
        num = (ss - 2 * n * dot).astype(np.float64)
        den = (n * n).astype(np.float64)
        return pd.Series(num / den)

    return _dk("xq", "s", "n")


def _assign(vectors_q: DataFrame, cents: list[tuple[int, list[int], int]]) -> DataFrame:
    """(vec_id, xq, cell): nearest centroid by exact distance, ties -> low id."""
    spark = vectors_q.sparkSession
    cent_df = local_df(
        spark,
        [(cid, s, n) for cid, s, n in cents],
        "cent_id INT, s ARRAY<BIGINT>, n BIGINT",
    )
    scored = vectors_q.crossJoin(F.broadcast(cent_df)).withColumn(
        "dkey", _dist_key_expr()
    )
    return scored.groupBy("vec_id").agg(
        F.min_by("cent_id", F.struct("dkey", "cent_id")).alias("cell"),
        F.first("xq").alias("xq"),
    )


def kmeans_train(
    sample_q: DataFrame, k: int = 8, iters: int = 3, dim: int = DIM
) -> list[tuple[int, list[int], int]]:
    """Lloyd's k-means on quantized vectors; returns [(cent_id, sums, n)].

    Init: the k lowest vec_ids become centroids (count 1).  Each iteration
    is one broadcast-assign + one explode/aggregate; only the k*(dim+1)
    centroid integers return to the driver.
    """
    init = (
        sample_q.orderBy("vec_id").limit(k).select("xq").collect()
    )
    if not init:
        raise ValueError(
            "kmeans_train: empty training sample — no rows to initialize "
            "centroids from (assignment against zero centroids would "
            "silently drop every vector)"
        )
    cents = [(i, [int(v) for v in r["xq"]], 1) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = _assign(sample_q, cents)
        upd = (
            assigned.select("cell", F.posexplode("xq").alias("i", "xv"))
            .groupBy("cell", "i")
            .agg(F.sum("xv").alias("si"), F.count("*").alias("nn"))
        )
        rows = upd.collect()
        by_cell: dict[int, tuple[list[int], int]] = {}
        for cid, _, _n in cents:
            got = [r for r in rows if r["cell"] == cid]
            if got:
                s = [0] * dim
                for r in got:
                    s[r["i"]] = int(r["si"])
                by_cell[cid] = (s, int(got[0]["nn"]))
        cents = [
            (cid, *by_cell[cid]) if cid in by_cell else (cid, s, n)
            for cid, s, n in cents
        ]
    return cents


def ivf_kmeans_assign(
    vectors: DataFrame,
    sample_max_id: int = 256,
    k: int = 8,
    iters: int = 3,
    dim: int = DIM,
) -> DataFrame:
    """Train on ``vec_id < sample_max_id``, assign the full corpus.

    Output: (vec_id, cell) for every vector.
    """
    # exact-double guarantee of the assignment key (module docstring):
    # |numerator| <= 192 * n^2 * Q^2 must stay under 2^53, which with the
    # quantization bound Q ~= 2600 caps the training sample at ~2600 rows
    if sample_max_id > 2600:
        raise ValueError(
            f"sample_max_id={sample_max_id} exceeds the integer-exactness "
            "bound (~2600): the nearest-centroid key would overflow 2^53 "
            "and Spark/DuckDB bit-identity is no longer guaranteed"
        )
    vq = quantize(vectors, dim)
    cents = kmeans_train(vq.filter(F.col("vec_id") < sample_max_id), k, iters, dim)
    return _assign(vq, cents).select("vec_id", "cell")


# ---------------------------------------------------------------------------
# oracle: the same fixed-iteration training unrolled as DuckDB CTEs
# ---------------------------------------------------------------------------


def _kmeans_oracle(sample_max_id: int = 256, k: int = 8, iters: int = 3, dim: int = DIM) -> str:
    d2 = (
        f"(CAST(list_sum(list_transform(c.s, v -> v * v)) "
        f"- 2 * c.n * list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> s.xq[i] * c.s[i])) AS DOUBLE) / CAST(c.n * c.n AS DOUBLE))"
    )
    parts = [
        f"""v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {QUANT_SCALE}.0 + 0.5) AS BIGINT)) AS xq
  FROM embeddings),
samp AS (SELECT * FROM v WHERE vec_id < {sample_max_id}),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
         xq AS s, CAST(1 AS BIGINT) AS n
  FROM samp ORDER BY vec_id LIMIT {k})"""
    ]
    for t in range(1, iters + 1):
        prev = f"c{t - 1}"
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, xq, cent_id AS cell FROM (
    SELECT s.vec_id, s.xq, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY {d2}, c.cent_id) AS rk
    FROM samp s CROSS JOIN {prev} c) WHERE rk = 1),
u{t} AS (
  SELECT cell, array_agg(si ORDER BY i) AS s2, MAX(nn) AS n2 FROM (
    SELECT cell, i, SUM(xq[i]) AS si, COUNT(*) AS nn
    FROM a{t} CROSS JOIN generate_series(1, {dim}) AS g(i)
    GROUP BY cell, i) GROUP BY cell),
c{t} AS (
  SELECT p.cent_id, COALESCE(u.s2, p.s) AS s, COALESCE(u.n2, p.n) AS n
  FROM {prev} p LEFT JOIN u{t} u ON u.cell = p.cent_id)"""
        )
    parts.append(
        f"""final AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT s.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY {d2}, c.cent_id) AS rk
    FROM v s CROSS JOIN c{iters} c) WHERE rk = 1)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + "\nSELECT vec_id, cell FROM final"
    )


@register("ivf_kmeans_assign", _kmeans_oracle)
def ivf_kmeans_assign_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF build: k-means(k=8, 3 Lloyd iters) on vec_id<256, assign all."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_kmeans_assign(emb)
