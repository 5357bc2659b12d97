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

from ..sources.tables import load_table
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


def _key_matrix(X: np.ndarray, S: np.ndarray, n: np.ndarray) -> np.ndarray:
    """float64 nearest-centroid key matrix (rows x centroids).

    ``(||s||^2 - 2 * n * (xq . s)) / n^2`` — same order as the true squared
    distance to the mean s/n; exact-int64 numerator (< 2^53, module
    contract), so the astype(float64) is exact and the IEEE division is
    the identical correctly-rounded value on every engine.
    """
    dot = X @ S.T  # int64, exact under the 2^53 numerator bound
    ss = (S * S).sum(axis=1)
    num = (ss[None, :] - 2 * n[None, :] * dot).astype(np.float64)
    den = (n * n).astype(np.float64)
    return num / den[None, :]


def _cent_arrays(
    cents: list[tuple[int, list[int], int]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(cent_ids, S, n) sorted by cent_id so argmin tie-breaks to low id."""
    ordered = sorted(cents, key=lambda c: c[0])
    cids = np.array([c[0] for c in ordered], dtype=np.int64)
    S = np.array([c[1] for c in ordered], dtype=np.int64)
    n = np.array([c[2] for c in ordered], dtype=np.int64)
    return cids, S, n


def _assign(vectors_q: DataFrame, cents: list[tuple[int, list[int], int]]) -> DataFrame:
    """(vec_id, xq, cell): nearest centroid by exact distance, ties -> low id.

    The k-row centroid table rides into the pandas kernel as a closure
    constant (the broadcast a k-row crossJoin build would cost anyway),
    so assignment is ONE narrow Arrow stage — no candidate explosion, no
    groupBy(vec_id) shuffle.  ``argmin`` returns the first minimum, which
    with centroids sorted by cent_id replays min_by's (dkey, cent_id)
    struct order exactly (the integer numerator can't produce -0.0, so
    IEEE and java.lang.Double comparisons agree).
    """
    cids, S, n = _cent_arrays(cents)

    @F.pandas_udf("int")
    def _cell(sx: pd.Series) -> pd.Series:
        if len(sx) == 0:
            return pd.Series([], dtype="int32")
        X = np.stack(sx.to_numpy()).astype(np.int64, copy=False)
        key = _key_matrix(X, S, n)
        return pd.Series(cids[key.argmin(axis=1)].astype(np.int32))

    return vectors_q.select("vec_id", "xq", _cell("xq").alias("cell"))


def kmeans_train(
    sample_q: DataFrame, k: int = 8, iters: int = 3, dim: int = DIM
) -> list[tuple[int, list[int], int]]:
    """Lloyd's k-means on quantized vectors; returns [(cent_id, sums, n)].

    Init: the k lowest vec_ids become centroids (count 1).  The sample is
    bounded at ~2600 rows by the module's exactness contract
    (``sample_max_id`` guard), i.e. O(metadata) — so it is collected ONCE
    and the fixed-count Lloyd rounds run driver-side on the same exact
    int64 arithmetic (sums are associative, the float64 division is the
    identical IEEE value), replacing ~2 jobs per round with zero.  The
    full-corpus assignment stays distributed (``_assign``).
    """
    rows = sample_q.select("vec_id", "xq").collect()
    if not rows:
        raise ValueError(
            "kmeans_train: empty training sample — no rows to initialize "
            "centroids from (assignment against zero centroids would "
            "silently drop every vector)"
        )
    rows.sort(key=lambda r: r["vec_id"])
    X = np.array([r["xq"] for r in rows], dtype=np.int64)
    kk = min(k, len(rows))
    S = X[:kk].copy()
    n = np.ones(kk, dtype=np.int64)
    for _ in range(iters):
        cell = _key_matrix(X, S, n).argmin(axis=1)  # ties -> lowest cent_id
        for c in range(kk):
            members = cell == c
            if members.any():
                S[c] = X[members].sum(axis=0)
                n[c] = int(members.sum())
    return [(c, [int(v) for v in S[c]], int(n[c])) for c in range(kk)]


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
