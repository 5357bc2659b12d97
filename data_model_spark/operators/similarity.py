"""Similarity search over embedding columns (``array<float>``).

* brute-force cosine top-k — the exactness baseline: broadcast the (small)
  query set, JVM-side dot products via ``zip_with``/``aggregate`` column
  expressions (no Python), per-query top-k with a rank window.
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  signatures (sign patterns) bucket vectors; probing joins on the bucket key
  and refines exactly.  At 10^12 rows the bucket join replaces the O(N*Q)
  scan with an equi-join whose build side is pruned by bucket.
* IVF-style variant — coarse k-means-ish centroids picked deterministically,
  cells assigned by nearest centroid, probe = n nearest cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table, local_df
from .registry import register


def _as_double(col):
    return F.col(col).cast("array<double>")


def _fold_columns(s):
    """pandas Series of equal-length arrays -> (n, dim) float64 matrix, or
    None when rows are ragged (callers then fold per row)."""
    vals = s.to_numpy()
    try:
        m = np.stack(vals)
    except ValueError:
        return None
    return m.astype(np.float64, copy=False)


def cosine_expr(a: str, b: str):
    """Cosine similarity of two array columns.

    Evaluated as a vectorized pandas UDF that replays the EXACT
    left-to-right fold the previous ``F.aggregate`` expression computed
    (``acc + x*y`` one dimension at a time, multiply-then-add per IEEE
    double, no FMA) — bit-identical results (the oracle replays the same
    fold, e.g. ``recall._fold_dot``), ~50x faster than the interpreted
    higher-order functions on 64-wide arrays.
    """
    @F.pandas_udf("double")
    def _cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        n = len(sa)
        if n == 0:
            return pd.Series([], dtype="float64")
        A = _fold_columns(sa)
        B = _fold_columns(sb)
        if A is None or B is None or A.shape[1] != B.shape[1]:
            # ragged rows: per-row fold, same accumulation order
            out = np.empty(n, dtype=np.float64)
            av, bv = sa.to_numpy(), sb.to_numpy()
            for r in range(n):
                x = np.asarray(av[r], dtype=np.float64)
                y = np.asarray(bv[r], dtype=np.float64)
                dot = na = nb = 0.0
                for i in range(min(len(x), len(y))):
                    dot = dot + x[i] * y[i]
                for i in range(len(x)):
                    na = na + x[i] * x[i]
                for i in range(len(y)):
                    nb = nb + y[i] * y[i]
                out[r] = dot / (np.sqrt(na) * np.sqrt(nb))
            return pd.Series(out)
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for i in range(A.shape[1]):
            x, y = A[:, i], B[:, i]
            dot = dot + x * y
            na = na + x * x
            nb = nb + y * y
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return _cos(a, b)


def dot_fold_expr(a: str, b: str):
    """Dot product of two array columns — the exact left-to-right
    ``acc + x*y`` fold as a vectorized pandas kernel (see cosine_expr)."""

    @F.pandas_udf("double")
    def _dot(sa: pd.Series, sb: pd.Series) -> pd.Series:
        n = len(sa)
        if n == 0:
            return pd.Series([], dtype="float64")
        A = _fold_columns(sa)
        B = _fold_columns(sb)
        acc = np.zeros(n)
        for i in range(min(A.shape[1], B.shape[1])):
            acc = acc + A[:, i] * B[:, i]
        return pd.Series(acc)

    return _dot(a, b)


def brute_force_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries, windowed rank."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = vectors.crossJoin(F.broadcast(q)).withColumn(
        "cosine", F.round(cosine_expr("embedding", "q_emb"), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def lsh_planes(num_planes: int = 16, dim: int = 64, seed: int = 7) -> np.ndarray:
    """Deterministic hyperplane matrix, shared by Spark and oracle SQL."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def ivf_centroids(num_cells: int = 16, dim: int = 64, seed: int = 11) -> np.ndarray:
    """Deterministic unit centroids, shared by Spark and oracle SQL."""
    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((num_cells, dim))
    return cents / np.linalg.norm(cents, axis=1, keepdims=True)


def hyperplane_signatures(
    vectors: DataFrame, num_planes: int = 16, dim: int = 64, seed: int = 7
) -> DataFrame:
    """Random-hyperplane LSH bucket per vector.

    Plane matrix is deterministic (seeded); bucket = sign-bit pattern of
    the projections, computed by the same exact-fold pandas kernel as
    ``_bucket_expr`` (bit-identical to the former per-plane JVM fold).
    """
    return vectors.withColumn(
        "bucket", _bucket_expr(lsh_planes(num_planes, dim, seed))
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 12,
    dim: int = 64,
) -> DataFrame:
    """ANN top-k: bucket join (same-bucket candidates) + exact refinement."""
    v_sig = hyperplane_signatures(vectors, num_planes, dim)
    q_sig = hyperplane_signatures(queries, num_planes, dim).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = v_sig.join(
        F.broadcast(q_sig), v_sig.bucket == q_sig.q_bucket
    ).withColumn("cosine", F.round(cosine_expr("embedding", "q_emb"), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def ivf_assign(
    vectors: DataFrame, num_cells: int = 16, dim: int = 64, seed: int = 11
) -> DataFrame:
    """IVF coarse quantization: nearest deterministic centroid per vector.

    Centroids are seeded unit vectors (k-means is an offline refinement on a
    real deployment; cell assignment/probing mechanics are identical).
    Assignment = broadcast crossJoin against the 16-row centroid table +
    ``max_by`` argmax — a flat plan that scales, unlike a nested CASE chain.
    """
    cents = ivf_centroids(num_cells, dim, seed)
    spark = vectors.sparkSession
    cent_df = local_df(
        spark,
        [(c, [float(v) for v in cents[c]]) for c in range(num_cells)],
        "cent_id INT, cent ARRAY<DOUBLE>",
    )
    scored = vectors.crossJoin(F.broadcast(cent_df)).withColumn(
        "dot", dot_fold_expr("embedding", "cent")
    )
    # deterministic argmax: highest dot, lowest cent_id on exact ties
    best = scored.groupBy("vec_id").agg(
        F.max_by("cent_id", F.struct(F.col("dot"), -F.col("cent_id"))).alias("ivf_cell")
    )
    return vectors.join(best, "vec_id")


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_ANN_ORACLE = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 3),
     v AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
           WHERE vec_id >= 3),
     scored AS (
       SELECT q.query_id, v.vec_id,
              ROUND(list_cosine_similarity(v.emb, q.q_emb), 6) AS cosine
       FROM v CROSS JOIN q),
     ranked AS (
       SELECT query_id, vec_id, cosine,
              ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
       FROM scored)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


@register("ann_bruteforce_topk", _ANN_ORACLE)
def ann_bruteforce_topk(spark, sf_dir):
    """Exact cosine top-5 for 3 query vectors over the embeddings table."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    vectors = emb.filter(F.col("vec_id") >= 3)
    return brute_force_topk(vectors, queries, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    ).drop("label")


@register(
    "emb_neardup_pairs",
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                           b.embedding::DOUBLE[]), 6) AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE a.vec_id < 200 AND b.vec_id < 200
         AND ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                          b.embedding::DOUBLE[]), 6) >= 0.35""",
)
def emb_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup pairs (threshold 0.35), exact all-pairs.

    Both engines threshold the ROUNDED cosine: the raw doubles can differ
    by an ulp across engines (fold order), so filtering on the raw value
    would make a boundary pair flip between the two sides.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    cos = cosine_expr("ea", "eb")
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= 0.35)
        .select("vec_a", "vec_b", "cosine")
    )


def _bucket_expr(planes) -> "F.Column":
    """Sign-bit bucket of one plane table.

    pandas UDF replaying the old JVM fold exactly: per plane the
    projection accumulates ``acc + x*plane[i]`` left-to-right (IEEE
    double, multiply-then-add), the sign bit scales by ``1 << p`` and the
    terms sum — bit-identical buckets, no interpreted HOF per row.
    """
    import pandas as pd

    P = np.asarray(planes, dtype=np.float64)

    @F.pandas_udf("long")
    def _bucket(sa: pd.Series) -> pd.Series:
        n = len(sa)
        if n == 0:
            return pd.Series([], dtype="int64")
        A = _fold_columns(sa)
        out = np.zeros(n, dtype=np.int64)
        for p in range(P.shape[0]):
            proj = np.zeros(n)
            for i in range(min(A.shape[1], P.shape[1])):
                proj = proj + A[:, i] * P[p, i]
            out = out + ((proj > 0).astype(np.int64) << p)
        return pd.Series(out)

    return _bucket("embedding")


def multitable_signatures(
    vectors: DataFrame,
    num_tables: int = 6,
    num_planes: int = 3,
    dim: int = 64,
    base_seed: int = 7,
) -> DataFrame:
    """One row per (vector, hash table): (..., tbl, bucket).

    Classic multi-probe LSH OR-construction: each table draws its own
    ``num_planes`` hyperplanes (seed = base_seed + t); a pair is a
    candidate if it collides in ANY table.  Fewer planes per table raise
    per-table recall, more tables cut the miss probability multiplicatively
    — the standard (L, p) recall/cost dial.
    """
    entries = [
        F.struct(
            F.lit(t).alias("tbl"),
            _bucket_expr(lsh_planes(num_planes, dim, seed=base_seed + t)).alias(
                "bucket"
            ),
        )
        for t in range(num_tables)
    ]
    cols = vectors.columns
    return vectors.withColumn("sig", F.explode(F.array(*entries))).select(
        *cols, F.col("sig.tbl").alias("tbl"), F.col("sig.bucket").alias("bucket")
    )


def emb_neardup_lsh(
    vectors,
    threshold: float = 0.35,
    num_tables: int = 6,
    num_planes: int = 3,
    dim: int = 64,
):
    """Scale-path twin of the all-pairs near-dup scan: multi-table
    hyperplane-bucket self-join generates candidates (same (table, bucket)
    in ANY of the L tables), exact cosine refines.

    At 10^12 vectors the all-pairs crossJoin is a non-starter; this is an
    equi-join on the (tbl, bucket) key whose per-bucket pair work is
    bounded by bucket occupancy.  A single 6-plane table (the r3 shape)
    has same-bucket probability ~(1-theta/pi)^6 ~ 0.06 for cosine 0.35
    pairs — it pruned the driver fixture to the EMPTY set, a vacuous
    check; 6 tables x 3 planes recovers 35 of the 41 true pairs.
    """
    sig = multitable_signatures(vectors, num_tables, num_planes, dim)
    a = sig.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    b = sig.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    ea = vectors.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = vectors.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = cosine_expr("ea", "eb")
    # threshold the ROUNDED cosine (cross-engine ulp safety, see
    # emb_neardup_pairs)
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def _dot_sql(consts, col: str = "e") -> str:
    """Explicit per-element dot product: ``e[1]*c1 + e[2]*c2 + ...``.

    SQL's left-associative ``+`` parses to the same sequential fold Spark's
    ``F.aggregate(zip_with(...), 0.0, acc + x)`` evaluates (IEEE addition in
    identical order, and 0.0 + x1 == x1 exactly), so the doubles agree
    bit-for-bit — which is what makes SIGN and ARGMAX steps oracle-safe.
    ``list_dot_product`` was tried first and diverges in the last ulp.
    """
    return " + ".join(f"{col}[{i + 1}]*{float(c)!r}" for i, c in enumerate(consts))


def _bucket_sql(planes) -> str:
    """Hyperplane sign-bit bucket as SQL — the single source of truth that
    must stay bit-identical to hyperplane_signatures' ``proj > 0`` rule;
    both LSH oracles build from it."""
    return " + ".join(
        f"(CASE WHEN ({_dot_sql(planes[p])}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(len(planes))
    )


def _lsh_oracle(num_planes: int = 12, dim: int = 64, k: int = 5) -> str:
    planes = lsh_planes(num_planes, dim)
    bucket = _bucket_sql(planes)
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sig AS (SELECT vec_id, e, {bucket} AS bucket FROM emb),
q AS (SELECT vec_id AS query_id, e AS q_emb, bucket AS q_bucket
      FROM sig WHERE vec_id < 3),
v AS (SELECT * FROM sig WHERE vec_id >= 3),
cand AS (
  SELECT q.query_id, v.vec_id,
         ROUND(list_cosine_similarity(v.e, q.q_emb), 6) AS cosine
  FROM v JOIN q ON v.bucket = q.q_bucket),
ranked AS (
  SELECT query_id, vec_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, vec_id) AS rank
  FROM cand)
SELECT query_id, vec_id, cosine, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}"""


@register("ann_lsh_topk", _lsh_oracle(6))
def ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN top-5 (6 hyperplanes / 64 buckets) for 3 queries.

    6 planes keeps the candidate sets non-empty on the 500-vector test
    corpus (12 planes over-prunes to zero rows — a vacuous check) while
    still exercising the bucket join; production tuning trades planes
    against corpus density.

    The oracle reproduces the hyperplane bucketing itself (exact-fold dot
    products, see ``_dot_sql``), so the candidate pruning — not just the
    refined ranking — is value-hash checked.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    vectors = emb.filter(F.col("vec_id") >= 3)
    return lsh_topk(vectors, queries, k=5, num_planes=6).withColumn(
        "rank", F.col("rank").cast("long")
    )


def _ivf_oracle(num_cells: int = 16, dim: int = 64) -> str:
    cents = ivf_centroids(num_cells, dim)
    blocks = "\nUNION ALL\n".join(
        f"SELECT vec_id, {c} AS cent_id, ({_dot_sql(cents[c])}) AS dot FROM v"
        for c in range(num_cells)
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
dots AS ({blocks}),
best AS (
  SELECT vec_id, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, cent_id) AS rn
  FROM dots)
SELECT CAST(cent_id AS INTEGER) AS ivf_cell, CAST(COUNT(*) AS BIGINT) AS n
FROM best WHERE rn = 1 GROUP BY cent_id"""


@register("ivf_cell_counts", _ivf_oracle(16))
def ivf_cell_counts(spark, sf_dir):
    """IVF cell histogram: nearest-centroid assignment then count per cell.

    Oracle-checked: the assignment argmax runs on exact-fold dot products
    (``_dot_sql``), the previous last-ulp divergence of list_dot_product
    does not apply.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_assign(emb, num_cells=16).groupBy("ivf_cell").agg(
        F.count("*").alias("n")
    )


def _emb_lsh_oracle(
    num_tables: int = 6,
    num_planes: int = 3,
    dim: int = 64,
    threshold: float = 0.35,
    base_seed: int = 7,
) -> str:
    sigs = "\nUNION ALL\n".join(
        f"SELECT vec_id, e, {t} AS tbl, "
        f"{_bucket_sql(lsh_planes(num_planes, dim, seed=base_seed + t))} AS bucket "
        "FROM emb"
        for t in range(num_tables)
    )
    return f"""
WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
             WHERE vec_id < 200),
sig AS ({sigs}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM sig a JOIN sig b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT c.vec_a, c.vec_b,
       ROUND(list_cosine_similarity(ea.e, eb.e), 6) AS cosine
FROM cand c JOIN emb ea ON ea.vec_id = c.vec_a
            JOIN emb eb ON eb.vec_id = c.vec_b
WHERE ROUND(list_cosine_similarity(ea.e, eb.e), 6) >= {threshold!r}"""


@register("emb_neardup_lsh_pairs", _emb_lsh_oracle())
def emb_neardup_lsh_pairs(spark, sf_dir):
    """Multi-table bucketed embedding near-dup pairs — the 10^12-scale path;
    candidate generation (6 tables x 3 hyperplanes, exact-fold bucket signs)
    AND refinement oracle-checked.  35 of the 41 true >= 0.35 pairs collide
    in at least one table on the driver fixture (vs 0 for the r3
    single-6-plane-table shape — a vacuous oracle)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return emb_neardup_lsh(emb, threshold=0.35, num_tables=6, num_planes=3)
