"""Fréchet-distance moments: per-slice exact (count, mean, covariance).

FID / Fréchet Inception Distance (Heusel et al. 2017) is the standard
generated-vs-real corpus comparison, and its data-side cost is exactly
two moment sweeps: ``FID = |mu1 - mu2|^2 + Tr(C1 + C2 - 2 (C1 C2)^{1/2})``
needs only each slice's (n, sum, Gramian).  The same moments drive
train/eval drift monitors and Mahalanobis outlier scoring.  This operator
computes them DISTRIBUTED and EXACT; the O(d^3) matrix square root is
driver-side NumPy on the d x d result (d = 64), where it belongs.

Slices: ``vec_id % 2`` — the deterministic stand-in for real/generated
(or train/eval) corpus halves.

Scale shape = ``emb_gramian``'s: each partition reduces its rows to one
(count, d-vector, d x d Gramian) accumulator per slice inside an Arrow
batch (NumPy matmul), and the shuffle carries ~2 * (1 + d + d(d+1)/2)
rows per task — independent of corpus size — summed by one map-side-
combinable aggregation.  Zero joins.

Exactness: embeddings are lattice-quantized ``floor(x * 1e6 + 0.5)`` on
the double-widened float32 (one deterministic IEEE op, identical in
NumPy / Spark / DuckDB), then EVERYTHING is int64: counts, first moments,
second moments.  Moment-row encoding: (slc, 0, 0, n) count, (slc, i, 0,
sum_i) first moments, (slc, i, j, g_ij) upper-triangle second moments,
1-indexed.

Oracle: full DuckDB SQL twin (explode + self-join, the ``emb_gramian``
oracle extended with the parity split and the UNION of the three moment
families) — scales with sf_dir.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
from .gramian import DIM, Q_SCALE


def fid_moments(emb: DataFrame, dim: int = DIM) -> DataFrame:
    """(slc, i, j, v) exact int64 moment rows for the two vec_id-parity
    slices: (slc,0,0)=count, (slc,i,0)=sum_i, (slc,i,j>=i)=Gramian."""

    def accum(batches):
        import pandas as pd

        n = {0: 0, 1: 0}
        s = {k: np.zeros(dim, np.int64) for k in (0, 1)}
        G = {k: np.zeros((dim, dim), np.int64) for k in (0, 1)}
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q = np.floor(E * Q_SCALE + 0.5).astype(np.int64)
            assert np.abs(Q).max() < (1 << 21), "quantized component too large"
            par = (pdf["vec_id"].to_numpy() % 2).astype(np.int64)
            for k in (0, 1):
                Qk = Q[par == k]
                if not len(Qk):
                    continue
                n[k] += len(Qk)
                s[k] += Qk.sum(axis=0)
                G[k] += Qk.T @ Qk
        iu = np.triu_indices(dim)
        for k in (0, 1):
            if not n[k]:
                continue
            rows = {
                "slc": np.concatenate(
                    [[k], np.full(dim, k), np.full(len(iu[0]), k)]
                ).astype(np.int64),
                "i": np.concatenate(
                    [[0], np.arange(1, dim + 1), iu[0] + 1]
                ).astype(np.int64),
                "j": np.concatenate(
                    [[0], np.zeros(dim, np.int64), iu[1] + 1]
                ).astype(np.int64),
                "v": np.concatenate([[n[k]], s[k], G[k][iu]]).astype(np.int64),
            }
            yield pd.DataFrame(rows)

    partials = emb.select("vec_id", "embedding").mapInPandas(
        accum, "slc long, i long, j long, v long"
    )
    return partials.groupBy("slc", "i", "j").agg(F.sum("v").alias("v"))


def frechet_from_moments(rows, dim: int = DIM) -> float:
    """Driver-side FID from exact moment rows [(slc, i, j, v), ...].

    Population covariance (divide by n); trace sqrt term via the
    eigenvalues of C1 @ C2 (equal to those of the PSD product
    C1^{1/2} C2 C1^{1/2}, so real and >= 0 up to round-off)."""
    n = {0: 0, 1: 0}
    s = {k: np.zeros(dim) for k in (0, 1)}
    G = {k: np.zeros((dim, dim)) for k in (0, 1)}
    for slc, i, j, v in rows:
        k = int(slc)
        if i == 0 and j == 0:
            n[k] = int(v)
        elif j == 0:
            s[k][i - 1] = float(v)
        else:
            G[k][i - 1, j - 1] = float(v)
            G[k][j - 1, i - 1] = float(v)
    mu, C = {}, {}
    for k in (0, 1):
        q = 1.0 / Q_SCALE
        mu[k] = s[k] / n[k] * q
        C[k] = (G[k] / n[k] - np.outer(s[k] / n[k], s[k] / n[k])) * q * q
    ev = np.linalg.eigvals(C[0] @ C[1])
    tr_sqrt = float(np.sqrt(np.clip(ev.real, 0.0, None)).sum())
    d = mu[0] - mu[1]
    return float(d @ d + np.trace(C[0]) + np.trace(C[1]) - 2.0 * tr_sqrt)


_FID_ORACLE = f"""
WITH q AS (
  SELECT vec_id % 2 AS slc, vec_id,
         list_transform(embedding::DOUBLE[],
                        v -> CAST(FLOOR(v * {Q_SCALE} + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), e AS (
  SELECT slc, vec_id, i, qv[i] AS v
  FROM q, generate_series(1, {DIM}) AS t(i)
)
SELECT slc, CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS j,
       CAST(COUNT(*) AS BIGINT) AS v
FROM q GROUP BY slc
UNION ALL
SELECT slc, i, CAST(0 AS BIGINT) AS j, CAST(SUM(v) AS BIGINT) AS v
FROM e GROUP BY slc, i
UNION ALL
SELECT a.slc AS slc, a.i AS i, b.i AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS v
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.slc, a.i, b.i"""


@register("fid_moments", _FID_ORACLE)
def fid_moments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-slice moment rows (count / mean / covariance precursors)
    over the embeddings table — the distributed 99% of an FID run."""
    return fid_moments(load_table(spark, sf_dir, "embeddings"))
