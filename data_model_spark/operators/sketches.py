"""Mergeable frequency/cardinality sketches: count-min, HyperLogLog.

At 100 TB, ad-hoc "how often / how many distinct" questions cannot afford
exact global dictionaries; the standard answers are fixed-size mergeable
sketches (Cormode & Muthukrishnan's count-min, Flajolet et al.'s HLL —
both published algorithms).  Both are implemented here as map-side
combinable integer aggregations over the md5_60 cross-engine hash
(operators/dedup.py:50), so a DuckDB oracle replays candidate hashing,
register updates, AND the estimator arithmetic bit-for-bit:

* count-min: the sketch is a (depth x width) count table — a groupBy over
  (row, bucket) that partial-aggregates map-side; estimates are a
  broadcast join of distinct keys against the tiny table, min over rows.
  Estimates NEVER undercount (est >= exact by construction) — the
  registered query outputs both so the driver hash verifies the property.
* HLL: register j keeps the max leading-zero rank of hashes bucketed to
  j; the estimator folds registers through EXACT integer arithmetic
  (sum of 2^(62-M_j) as DECIMAL(38,0)) so the only floating-point steps
  are one division and one final ROUND — identical IEEE doubles on both
  engines.  Small-range linear counting applies below 2.5*m when empty
  registers exist.

Mergeability (the reason sketches beat exact counting at scale): counts
add elementwise, HLL registers max elementwise — proven in
tests/test_sketches.py by splitting the corpus and merging.

Spark 4 ships HLL sketch builtins (hll_sketch_agg); this module exists so
the sketch semantics are engine-owned and ORACLE-CHECKABLE — the driver
gate can't verify an opaque binary sketch, and the reference's metrics
tables need deterministic, replayable numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import MD5_60_SQL, md5_60

# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def cms_sketch(keys: DataFrame, key: str = "key", depth: int = 4, width: int = 512) -> DataFrame:
    """Count-min sketch of a key stream: (row_i, bucket, cnt), depth*width max rows.

    Row i hashes with md5_60("i:" || key) % width — independent-enough rows
    from one cross-engine primitive.  The groupBy partial-aggregates
    map-side, so the shuffle moves at most depth*width rows per input
    partition regardless of corpus size.
    """
    hashed = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.pmod(
                            md5_60(F.concat(F.lit(f"{i}:"), F.col(key))),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("h")
    ).select("h.row_i", "h.bucket")
    return hashed.groupBy("row_i", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimates(
    keys: DataFrame, key: str = "key", depth: int = 4, width: int = 512
) -> DataFrame:
    """Per-distinct-key count-min estimate next to the exact count.

    est = min over rows of the key's bucket counter — never undercounts.
    The sketch is depth*width rows, so the probe side joins it broadcast;
    the exact count rides along from the same distinct pass (at true scale
    the candidate set would come from a sample or a paired heap — the
    sketch itself never enumerates keys).
    """
    sketch = cms_sketch(keys, key, depth, width)
    exact = keys.groupBy(key).agg(F.count("*").alias("exact"))
    probes = exact.select(
        key,
        "exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        F.pmod(
                            md5_60(F.concat(F.lit(f"{i}:"), F.col(key))),
                            F.lit(width),
                        ).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("h"),
    ).select(key, "exact", "h.row_i", "h.bucket")
    return (
        probes.join(F.broadcast(sketch), ["row_i", "bucket"])
        .groupBy(key, "exact")
        .agg(F.min("cnt").alias("est"))
        .select(key, "est", "exact")
    )


def _cms_hash_sql(key_expr: str, i: int, width: int) -> str:
    h = MD5_60_SQL.format(col=f"CAST({i} AS VARCHAR) || ':' || {key_expr}")
    return f"({h}) % {width}"


def cms_oracle_sql(stream_cte: str, key: str, depth: int, width: int, top_n: int) -> str:
    """DuckDB twin of cms_estimates over ``stream_cte`` (defines table s(key))."""
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT {key}, exact, {i} AS row_i, {_cms_hash_sql(key, i, width)} AS bucket FROM exact_c"
        for i in range(depth)
    )
    sketch_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS row_i, {_cms_hash_sql(key, i, width)} AS bucket FROM s"
        for i in range(depth)
    )
    return f"""
{stream_cte},
sk AS (SELECT row_i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM ({sketch_rows}) GROUP BY row_i, bucket),
exact_c AS (SELECT {key}, CAST(COUNT(*) AS BIGINT) AS exact FROM s GROUP BY {key}),
probes AS ({probe_rows}),
est AS (SELECT p.{key}, MIN(sk.cnt) AS est, p.exact
        FROM probes p JOIN sk ON sk.row_i = p.row_i AND sk.bucket = p.bucket
        GROUP BY p.{key}, p.exact)
SELECT {key}, est, exact FROM est ORDER BY est DESC, {key} LIMIT {top_n}"""


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

_HLL_HASH_BITS = 60  # md5_60


def _rho_sql(rest: str, rest_bits: int) -> str:
    """Leading-zero rank of ``rest`` within ``rest_bits`` bits, as a CASE
    chain valid in BOTH Spark SQL and DuckDB (rho = rest_bits - floor_log2
    for rest>0, else rest_bits+1)."""
    whens = "\n".join(
        f"WHEN {rest} >= {1 << k} THEN {rest_bits - k}" for k in range(rest_bits - 1, 0, -1)
    )
    return f"(CASE WHEN {rest} = 0 THEN {rest_bits + 1} {whens} ELSE {rest_bits} END)"


def hll_params(p: int) -> tuple[int, int, float]:
    """(m, rest_bits, C) — C = alpha_m * m^2 * 2^62 folded to ONE double
    literal so the raw estimate is a single IEEE division on both engines."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return m, _HLL_HASH_BITS - p, alpha * m * m * float(1 << 62)


def hll_registers(keys: DataFrame, key: str = "key", p: int = 8) -> DataFrame:
    """HLL register table (bucket, mj): max leading-zero rank per bucket."""
    m, rest_bits, _ = hll_params(p)
    h = md5_60(F.col(key))
    df = keys.select(
        F.shiftrightunsigned(h, rest_bits).alias("bucket"),
        (h.bitwiseAND(F.lit((1 << rest_bits) - 1))).alias("rest"),
    ).withColumn("rho", F.expr(_rho_sql("rest", rest_bits)))
    return df.groupBy("bucket").agg(F.max("rho").alias("mj"))


def hll_estimate(keys: DataFrame, key: str = "key", p: int = 8) -> DataFrame:
    """One-row HLL cardinality estimate with exact-integer register fold.

    S = sum of 2^(62-mj) over registers plus 2^62 per empty register, kept
    exact in DECIMAL(38,0); raw = C / double(S); linear counting below
    2.5*m when empty registers exist.  Every FP step is one division, one
    multiply-free constant, one ROUND — bit-replayable in SQL.
    """
    m, _, c_lit = hll_params(p)
    regs = hll_registers(keys, key, p)
    agg = regs.agg(
        F.count("*").alias("n_used"),
        F.sum(
            F.expr("CAST(shiftleft(CAST(1 AS BIGINT), 62 - mj) AS DECIMAL(38,0))")
        ).alias("s_used"),
    )
    return agg.select(
        (F.lit(m) - F.col("n_used")).cast("long").alias("n_zero"),
        F.expr(
            f"CASE WHEN {c_lit!r} / CAST(s_used + (CAST({m} AS DECIMAL(38,0)) - n_used)"
            f" * CAST({1 << 62} AS DECIMAL(38,0)) AS DOUBLE) <= {2.5 * m!r}"
            f" AND n_used < {m}"
            f" THEN ROUND({float(m)!r} * LN({float(m)!r} / CAST({m} - n_used AS DOUBLE)), 4)"
            f" ELSE ROUND({c_lit!r} / CAST(s_used + (CAST({m} AS DECIMAL(38,0)) - n_used)"
            f" * CAST({1 << 62} AS DECIMAL(38,0)) AS DOUBLE), 4) END"
        ).alias("est"),
    )


def hll_oracle_sql(stream_cte: str, key: str, p: int = 8, extra_select: str = "") -> str:
    """DuckDB twin of hll_estimate over ``stream_cte`` (defines s(key))."""
    m, rest_bits, c_lit = hll_params(p)
    h = MD5_60_SQL.format(col=key)
    rho = _rho_sql("rest", rest_bits)
    s_total = (
        f"s_used + (CAST({m} AS DECIMAL(38,0)) - n_used)"
        f" * CAST({1 << 62} AS DECIMAL(38,0))"
    )
    return f"""
{stream_cte},
hashed AS (SELECT ({h}) >> {rest_bits} AS bucket,
                  ({h}) & {(1 << rest_bits) - 1} AS rest FROM s),
regs AS (SELECT bucket, MAX({rho}) AS mj FROM hashed GROUP BY bucket),
agg AS (SELECT COUNT(*) AS n_used,
               SUM(CAST((CAST(1 AS BIGINT) << (62 - mj)) AS DECIMAL(38,0))) AS s_used
        FROM regs)
SELECT CAST({m} - n_used AS BIGINT) AS n_zero,
       CASE WHEN {c_lit!r} / CAST({s_total} AS DOUBLE) <= {2.5 * m!r}
                 AND n_used < {m}
            THEN ROUND({float(m)!r} * LN({float(m)!r} / CAST({m} - n_used AS DOUBLE)), 4)
            ELSE ROUND({c_lit!r} / CAST({s_total} AS DOUBLE), 4) END AS est{extra_select}
FROM agg"""


# ---------------------------------------------------------------------------
# registered queries (document bigrams / shingles as the key streams)
# ---------------------------------------------------------------------------

from ..sources.tables import load_table  # noqa: E402
from .registry import register  # noqa: E402

_BIGRAM_CTE = """
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), ' +') AS ws
  FROM documents WHERE length(string_split_regex(trim(lower(text)), ' +')) >= 2),
s AS (
  SELECT unnest(list_transform(generate_series(1, len(ws)-1),
                i -> ws[i] || ' ' || ws[i+1])) AS key
  FROM toks)"""

_SHINGLE_CTE = """
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), ' +') AS ws
  FROM documents WHERE length(string_split_regex(trim(lower(text)), ' +')) >= 3),
s AS (
  SELECT unnest(list_transform(generate_series(1, len(ws)-2),
                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS key
  FROM toks)"""


def _bigram_stream(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower("text")), " +")
    return (
        docs.select(ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws)-1),"
                    " i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))"
                )
            ).alias("key")
        )
    )


def _shingle_stream(spark, sf_dir) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.lower("text")), " +")
    return (
        docs.select(ws.alias("ws"))
        .filter(F.size("ws") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws)-2),"
                    " i -> concat(element_at(ws, i), ' ', element_at(ws, i+1),"
                    " ' ', element_at(ws, i+2)))"
                )
            ).alias("key")
        )
    )


_CMS_DEPTH, _CMS_WIDTH, _CMS_TOPN = 4, 512, 40


@register(
    "cms_heavy_hitters",
    lambda: cms_oracle_sql(_BIGRAM_CTE, "key", _CMS_DEPTH, _CMS_WIDTH, _CMS_TOPN),
)
def cms_heavy_hitters(spark, sf_dir):
    """Top document bigrams by count-min estimate, exact count alongside.

    916 distinct bigrams into a 4x512 sketch at sf0.01: collisions exist
    (est > exact on some rows), so the hash check covers the overcount
    behavior, not just a pass-through.  Deterministic total order
    (est DESC, key) bounds the output.
    """
    est = cms_estimates(_bigram_stream(spark, sf_dir), "key", _CMS_DEPTH, _CMS_WIDTH)
    return est.orderBy(F.desc("est"), "key").limit(_CMS_TOPN)


@register(
    "hll_distinct_shingles",
    lambda: hll_oracle_sql(
        _SHINGLE_CTE,
        "key",
        p=8,
        extra_select=",\n       (SELECT CAST(COUNT(DISTINCT key) AS BIGINT) FROM s) AS exact",
    ),
)
def hll_distinct_shingles(spark, sf_dir):
    """HLL(p=8) distinct-shingle estimate next to the exact count.

    ~16k distinct 3-gram shingles at sf0.01 — deep in the raw-estimator
    regime (no empty registers), so the driver hash pins the full register
    fold; at sf0.001 the same query exercises whichever branch the data
    lands in, identically on both engines.
    """
    stream = _shingle_stream(spark, sf_dir)
    est = hll_estimate(stream, "key", p=8)
    exact = stream.agg(F.countDistinct("key").alias("exact"))
    return est.crossJoin(exact)
