"""Embedding Gramian (second-moment matrix) — the PCA/whitening precursor.

Training-data pipelines over embedding corpora need the d x d second
moment G = E^T E for PCA projection, whitening, and drift monitoring
(SemDeDup-style pipelines whiten before clustering).  The scale shape is
the classic one: each partition reduces its rows to ONE d x d partial
Gramian inside Arrow batches (NumPy matmul), and the shuffle carries
only d(d+1)/2 upper-triangle cells per partition — at 10^12 rows and
d=64 that is 2,080 rows per task, independent of corpus size, summed by
one map-side-combinable aggregation.

Cross-engine exactness: float dot-product sums are accumulation-order
dependent, so the embeddings are first lattice-quantized —
``floor(x * 1e6 + 0.5)`` on the float32 value widened to double (exact
widening, identical IEEE ops in NumPy / Spark / DuckDB) — and ALL sums
are int64.  |q| <= ~2^21 per component, so a cell sum stays below 2^63
up to ~2^21 rows per dimension pair — asserted at runtime; beyond that,
split the corpus and merge partial Gramians (they are exact integers).

The DuckDB oracle replays the quantization and computes the Gramian by
explode + self-join — bit-exact because everything after the one
deterministic double op is integer arithmetic.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

DIM = 64
Q_SCALE = 10**6


def emb_gramian(emb: DataFrame, dim: int = DIM) -> DataFrame:
    """Upper-triangle (i, j, g) of the quantized Gramian, 1-indexed."""

    def gram(batches):
        import pandas as pd

        G = np.zeros((dim, dim), np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            Q = np.floor(E * Q_SCALE + 0.5).astype(np.int64)
            assert np.abs(Q).max() < (1 << 21), "quantized component too large"
            G += Q.T @ Q
            seen = True
        if seen:
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype(np.int64),
                    "j": (iu[1] + 1).astype(np.int64),
                    "g": G[iu],
                }
            )

    partials = emb.select("embedding").mapInPandas(
        gram, "i long, j long, g long"
    )
    return partials.groupBy("i", "j").agg(F.sum("g").alias("g"))


_GRAMIAN_ORACLE = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        v -> CAST(FLOOR(v * {Q_SCALE} + 0.5) AS BIGINT)) AS qv
  FROM embeddings
), e AS (
  SELECT vec_id, i, qv[i] AS v
  FROM q, generate_series(1, {DIM}) AS t(i)
)
SELECT a.i AS i, b.i AS j, CAST(SUM(a.v * b.v) AS BIGINT) AS g
FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i"""


@register("emb_gramian", _GRAMIAN_ORACLE)
def emb_gramian_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact embedding Gramian (upper triangle) over the
    embeddings table — the PCA/whitening input matrix."""
    return emb_gramian(load_table(spark, sf_dir, "embeddings"))
