"""Skyline (Pareto-dominance) query for multi-criteria data curation.

A training-data curation pass often wants the documents not dominated on
a set of quality axes (e.g. "no other doc has at least as many tokens AND
at most as many characters, one strictly better") — the classic skyline
operator (Borzsony/Kossmann/Stocker, ICDE 2001).  Reference parity: the
reference has no multi-criteria selection (its filters are per-row
predicates); this extends the curation suite (``operators/sampling.py``).

Distributed shape (same contraction as ``operators/hull.py``):

1. **Batch-local skyline** — a point dominated within its Arrow batch is
   dominated globally, so each ``mapInPandas`` batch emits only its local
   skyline: map-side reduction, no shuffle, candidates = batches x local
   skyline size.
2. **Final skyline** — candidates shuffle to one task, same kernel.
   Correctness: a global skyline point is undominated in every subset
   containing it, so stage 1 never drops it.

Dominance uses integer attributes only (exact comparisons, plan-order
independent).  Ties: two identical attribute vectors do not dominate each
other — both survive (the standard strict-in-one definition).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _local_skyline(pdf: pd.DataFrame, signs: np.ndarray) -> pd.DataFrame:
    """Rows of ``pdf`` not dominated within ``pdf``.

    ``signs`` aligns directions: attribute columns are pdf columns [1:],
    multiplied by +1 (maximize) / -1 (minimize) so dominance is uniformly
    "all >=, one >".  Chunked O(n^2/chunk) vectorized dominance — exact,
    bounded memory (chunk x n bool matrix).
    """
    vals = pdf.iloc[:, 1:].to_numpy(np.int64) * signs
    n = len(vals)
    keep = np.ones(n, dtype=bool)
    chunk = 1024
    for lo in range(0, n, chunk):
        block = vals[lo : lo + chunk]  # (c, d)
        ge = (vals[:, None, :] >= block[None, :, :]).all(axis=2)  # (n, c)
        gt = (vals[:, None, :] > block[None, :, :]).any(axis=2)
        dominated = (ge & gt).any(axis=0)
        keep[lo : lo + chunk] &= ~dominated
    return pdf.iloc[np.flatnonzero(keep)]


def skyline(
    points: DataFrame,
    maximize: Sequence[str] = (),
    minimize: Sequence[str] = (),
    id_col: str = "doc_id",
) -> DataFrame:
    """Pareto-optimal rows of ``points`` over integer attribute columns."""
    attrs = [*maximize, *minimize]
    if not attrs:
        raise ValueError("skyline needs at least one attribute column")
    signs = np.array([1] * len(maximize) + [-1] * len(minimize), dtype=np.int64)
    src = points.select(F.col(id_col).alias("id"), *attrs)
    schema = "id long, " + ", ".join(f"{a} long" for a in attrs)

    def local(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            if len(pdf):
                yield _local_skyline(pdf, signs)

    candidates = src.mapInPandas(local, schema)
    out = (
        candidates.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda pdf: _local_skyline(pdf.drop(columns=["g"]), signs), schema
        )
    )
    return out.withColumnRenamed("id", id_col)


# ---------------------------------------------------------------------------
# registered query: token-rich yet compact documents
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
         CAST(length(text) AS BIGINT) AS n_chars
  FROM documents)
SELECT p.doc_id, p.n_tokens, p.n_chars FROM d p
WHERE NOT EXISTS (
  SELECT 1 FROM d q
  WHERE q.doc_id <> p.doc_id
    AND q.n_tokens >= p.n_tokens AND q.n_chars <= p.n_chars
    AND (q.n_tokens > p.n_tokens OR q.n_chars < p.n_chars))"""


@register("skyline_docs", _SKYLINE_ORACLE)
def skyline_docs(spark, sf_dir):
    """Documents on the (max n_tokens, min n_chars) Pareto front — the
    anticorrelated pair (many tokens, few characters) keeps the front
    non-trivial; oracle is the O(n^2) NOT-EXISTS dominance definition."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return skyline(d, maximize=["n_tokens"], minimize=["n_chars"])
