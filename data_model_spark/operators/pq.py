"""Product quantization (PQ) codes for the embedding column.

Jégou, Douze & Schmid, "Product quantization for nearest neighbor
search" (TPAMI 2011): split each vector into ``m`` subvectors, run
k-means independently per subspace, and store each vector as the tuple
of its m nearest-centroid ids — the compressed representation behind
IVF-PQ indexes.  Asymmetric distance (ADC) approximates a query's
distance as the sum of per-subspace query-to-centroid lookups.

Cross-engine exactness: embeddings quantize to int64 components
(``ivf_kmeans.quantize``), and — unlike ``ivf_kmeans``'s rational
(sum, count) centroids, whose scaled distance is only comparable between
equal-count centroids — each Lloyd update here SNAPS the centroid mean
back to the integer grid: ``c_i = floor((2*s_i + n) / (2*n))``
(round-half-up of the exact mean, computed with pure integer floor
division).  Centroids are then plain integer vectors, assignment is the
exact L2 argmin (ties to the low centroid id), and the whole m x iters
training plus the full-corpus code assignment replays bit-for-bit in the
DuckDB oracle.  Grid snapping perturbs each centroid by at most half a
quantization step — noise-level against embedding scale 1024.

Scale shape: training touches only the sample, m times (the driver holds
m*k*subdim integers between iterations); code assignment is one
broadcast join per subspace against a k-row centroid table; ADC scoring
broadcasts the m*k lookup table — never a crossJoin against the corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..sources.tables import load_table, local_df
from .ivf_kmeans import QUANT_SCALE, quantize
from .registry import register

M_SUB = 4
SUB_DIM = 16
K_CENT = 8
ITERS = 2
SAMPLE_MAX_ID = 256


def _subspace(vq: DataFrame, j: int, sub_dim: int) -> DataFrame:
    off = j * sub_dim + 1  # Spark slice() is 1-based
    return vq.withColumn("xq", F.expr(f"slice(xq, {off}, {sub_dim})"))


def _d2_expr():
    # exact-int64 squared distance as a vectorized pandas kernel (order-
    # insensitive integer sum, identical to the former interpreted fold)
    import numpy as np
    @F.pandas_udf("long")
    def _d2(sx: pd.Series, sc: pd.Series) -> pd.Series:
        if len(sx) == 0:
            return pd.Series([], dtype="int64")
        X = np.stack(sx.to_numpy()).astype(np.int64, copy=False)
        C = np.stack(sc.to_numpy()).astype(np.int64, copy=False)
        d = X - C
        return pd.Series((d * d).sum(axis=1))

    return _d2("xq", "c")


def _assign_snap(vq: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    cent_df = local_df(
        vq.sparkSession, [(cid, c) for cid, c in cents], "cent_id INT, c ARRAY<BIGINT>"
    )
    scored = vq.crossJoin(F.broadcast(cent_df)).withColumn("d2", _d2_expr())
    return scored.groupBy("vec_id").agg(
        F.min_by("cent_id", F.struct("d2", "cent_id")).alias("cell"),
        F.first("xq").alias("xq"),
    )


def kmeans_snap_train(
    sample_q: DataFrame, k: int, iters: int, dim: int
) -> list[tuple[int, list[int]]]:
    """Grid-snapped Lloyd's: centroids are integer vectors; an emptied cell
    keeps its previous centroid.  Returns [(cent_id, components)]."""
    init = sample_q.orderBy("vec_id").limit(k).select("xq").collect()
    if not init:
        raise ValueError("kmeans_snap_train: empty training sample")
    cents = [(i, [int(v) for v in r["xq"]]) for i, r in enumerate(init)]
    for _ in range(iters):
        assigned = _assign_snap(sample_q, cents)
        rows = (
            assigned.select("cell", F.posexplode("xq").alias("i", "xv"))
            .groupBy("cell", "i")
            .agg(F.sum("xv").alias("si"), F.count("*").alias("nn"))
            .collect()
        )
        by_cell: dict[int, list[int]] = {}
        for cid, old in cents:
            got = [r for r in rows if r["cell"] == cid]
            if got:
                c = list(old)
                for r in got:
                    # round-half-up of the exact mean, pure integer
                    c[r["i"]] = (2 * int(r["si"]) + int(r["nn"])) // (2 * int(r["nn"]))
                by_cell[cid] = c
        cents = [(cid, by_cell.get(cid, old)) for cid, old in cents]
    return cents


def pq_train(
    vq_sample: DataFrame, m: int = M_SUB, sub_dim: int = SUB_DIM,
    k: int = K_CENT, iters: int = ITERS,
) -> list[list[tuple[int, list[int]]]]:
    """Per-subspace integer codebooks."""
    return [
        kmeans_snap_train(_subspace(vq_sample, j, sub_dim), k, iters, sub_dim)
        for j in range(m)
    ]


def pq_codes(
    vectors: DataFrame,
    sample_max_id: int = SAMPLE_MAX_ID,
    m: int = M_SUB,
    sub_dim: int = SUB_DIM,
    k: int = K_CENT,
    iters: int = ITERS,
    _books_out: list | None = None,
) -> DataFrame:
    """(vec_id, c0..c{m-1}): the PQ code tuple for every vector."""
    vq = quantize(vectors, m * sub_dim)
    books = pq_train(vq.filter(F.col("vec_id") < sample_max_id), m, sub_dim, k, iters)
    if _books_out is not None:
        _books_out.append(books)
    out = None
    for j, cents in enumerate(books):
        cj = (
            _assign_snap(_subspace(vq, j, sub_dim), cents)
            .select("vec_id", F.col("cell").alias(f"c{j}"))
        )
        out = cj if out is None else out.join(cj, "vec_id")
    return out


def adc_topk(
    vectors: DataFrame, query_vec_id: int, topk: int = 10, **kw
) -> DataFrame:
    """(vec_id, adc_d2): top-k corpus vectors by asymmetric PQ distance to
    the query (exact integer lookup-table sums; the query is excluded;
    ties break on vec_id)."""
    m, sub_dim = kw.get("m", M_SUB), kw.get("sub_dim", SUB_DIM)
    k, iters = kw.get("k", K_CENT), kw.get("iters", ITERS)
    sample_max_id = kw.get("sample_max_id", SAMPLE_MAX_ID)
    books_out: list = []
    codes = pq_codes(vectors, sample_max_id, m, sub_dim, k, iters, _books_out=books_out)
    books = books_out[0]
    vq = quantize(vectors, m * sub_dim)
    qrow = vq.filter(F.col("vec_id") == query_vec_id).select("xq").collect()
    if not qrow:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    q = [int(v) for v in qrow[0]["xq"]]

    lut = []
    for j, cents in enumerate(books):
        qs = q[j * sub_dim : (j + 1) * sub_dim]
        for cid, c in cents:
            lut.append((j, cid, sum((qi - ci) ** 2 for qi, ci in zip(qs, c))))
    from ..sources.tables import local_df

    lut_df = local_df(vectors.sparkSession, lut, "j int, cid int, d long")

    stacked = codes.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), F.col(f"c{j}").alias("cid"))
                for j in range(m)
            ])
        ).alias("p"),
    ).select("vec_id", F.col("p.j").alias("j"), F.col("p.cid").alias("cid"))
    scored = (
        stacked.join(F.broadcast(lut_df), ["j", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("d").alias("adc_d2"))
        .filter(F.col("vec_id") != query_vec_id)
    )
    return scored.orderBy("adc_d2", "vec_id").limit(topk)


def adc_topk_multi(
    vectors: DataFrame, query_ids: list[int], topk: int = 10, **kw
) -> DataFrame:
    """(query_id, vec_id, adc_d2, rank): batch ADC — train ONCE, score every
    query through one broadcast LUT join + per-query window, instead of
    ``adc_topk``'s per-query retrain.  LUT size = |Q| * m * k rows (the
    query set is the broadcast-small side, as in the kNN operators)."""
    from pyspark.sql.window import Window

    m, sub_dim = kw.get("m", M_SUB), kw.get("sub_dim", SUB_DIM)
    k, iters = kw.get("k", K_CENT), kw.get("iters", ITERS)
    sample_max_id = kw.get("sample_max_id", SAMPLE_MAX_ID)
    books_out: list = []
    codes = pq_codes(vectors, sample_max_id, m, sub_dim, k, iters, _books_out=books_out)
    books = books_out[0]
    vq = quantize(vectors, m * sub_dim)
    qrows = (
        vq.filter(F.col("vec_id").isin([int(q) for q in query_ids]))
        .select("vec_id", "xq")
        .collect()
    )  # bounded by the query set — the documented broadcast-small side
    lut = []
    for qr in qrows:
        q = [int(v) for v in qr["xq"]]
        for j, cents in enumerate(books):
            qs = q[j * sub_dim : (j + 1) * sub_dim]
            for cid, c in cents:
                lut.append(
                    (int(qr["vec_id"]), j, cid,
                     sum((qi - ci) ** 2 for qi, ci in zip(qs, c)))
                )
    from ..sources.tables import local_df

    lut_df = local_df(
        vectors.sparkSession, lut, "query_id long, j int, cid int, d long"
    )
    stacked = codes.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), F.col(f"c{j}").alias("cid"))
                for j in range(m)
            ])
        ).alias("p"),
    ).select("vec_id", F.col("p.j").alias("j"), F.col("p.cid").alias("cid"))
    scored = (
        stacked.join(F.broadcast(lut_df), ["j", "cid"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").alias("adc_d2"))
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_d2", "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
    )


# ---------------------------------------------------------------------------
# oracle: m subspaces x ITERS snapped-Lloyd steps unrolled as DuckDB CTEs
# ---------------------------------------------------------------------------

# floor((2s+n)/(2n)) with b = 2n > 0: (a - ((a % b + b) % b)) is an exact
# multiple of b, so the double division below is exact
_SNAP = (
    "CAST((2 * SUM(xq[i]) + COUNT(*)"
    " - ((((2 * SUM(xq[i]) + COUNT(*)) % (2 * COUNT(*))) + 2 * COUNT(*)) % (2 * COUNT(*))))"
    " / (2 * COUNT(*)) AS BIGINT)"
)


def _pq_oracle(
    sample_max_id: int = SAMPLE_MAX_ID, m: int = M_SUB, sub_dim: int = SUB_DIM,
    k: int = K_CENT, iters: int = ITERS,
) -> str:
    parts = [
        f"""v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {QUANT_SCALE}.0 + 0.5) AS BIGINT)) AS xqf
  FROM embeddings)"""
    ]
    finals = []
    for j in range(m):
        off = j * sub_dim + 1
        pfx = f"s{j}"
        d2 = (
            f"list_sum(list_transform(generate_series(1, {sub_dim}), "
            f"i -> (s.xq[i] - c.c[i]) * (s.xq[i] - c.c[i])))"
        )
        parts.append(
            f"""{pfx}v AS (
  SELECT vec_id, xqf[{off}:{off + sub_dim - 1}] AS xq FROM v),
{pfx}samp AS (SELECT * FROM {pfx}v WHERE vec_id < {sample_max_id}),
{pfx}c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_id,
         xq AS c
  FROM {pfx}samp ORDER BY vec_id LIMIT {k})"""
        )
        for t in range(1, iters + 1):
            prev = f"{pfx}c{t - 1}"
            parts.append(
                f"""{pfx}a{t} AS (
  SELECT vec_id, xq, cent_id AS cell FROM (
    SELECT s.vec_id, s.xq, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY {d2}, c.cent_id) AS rk
    FROM {pfx}samp s CROSS JOIN {prev} c) WHERE rk = 1),
{pfx}u{t} AS (
  SELECT cell, array_agg(ci ORDER BY i) AS c2 FROM (
    SELECT cell, i, {_SNAP} AS ci
    FROM {pfx}a{t} CROSS JOIN generate_series(1, {sub_dim}) AS g(i)
    GROUP BY cell, i) GROUP BY cell),
{pfx}c{t} AS (
  SELECT p.cent_id, COALESCE(u.c2, p.c) AS c
  FROM {prev} p LEFT JOIN {pfx}u{t} u ON u.cell = p.cent_id)"""
            )
        parts.append(
            f"""{pfx}f AS (
  SELECT vec_id, cent_id AS c{j} FROM (
    SELECT s.vec_id, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY {d2}, c.cent_id) AS rk
    FROM {pfx}v s CROSS JOIN {pfx}c{iters} c) WHERE rk = 1)"""
        )
        finals.append(f"{pfx}f")
    joins = finals[0]
    for t in finals[1:]:
        joins += f" JOIN {t} USING (vec_id)"
    cols = ", ".join(f"c{j}" for j in range(m))
    return "WITH " + ",\n".join(parts) + f"\nSELECT vec_id, {cols} FROM {joins}"


@register("pq_codes", _pq_oracle)
def pq_codes_query(spark, sf_dir):
    """PQ(m=4, k=8, 2 snapped-Lloyd iters per subspace) codes for every
    embedding; the oracle unrolls all 4 trainings + assignments — a single
    flipped argmin anywhere desynchronizes the hash."""
    return pq_codes(load_table(spark, sf_dir, "embeddings"))
