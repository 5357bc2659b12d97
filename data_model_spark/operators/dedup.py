"""Deduplication operators for training-data pipelines (documents table).

Scale-first designs — every algorithm is expressed as joins/aggregations
over exploded shingle/feature rows (the MapReduce formulation), never as a
driver-side pairwise loop:

* exact dedup           — content-hash groupBy (md5)
* n-gram Jaccard pairs  — explode distinct shingles -> self-equi-join on
                          shingle -> pair-count = intersection; union from
                          per-doc sizes.  Exact; hot shingles (boilerplate
                          n-grams above ``hot_min`` occurrences) are salted
                          BY DEFAULT via ``self_pairs`` so no single reducer
                          sees a whole hot key.
* MinHash + LSH         — k hash functions via affine transforms of a
                          60-bit md5 shingle hash; banding -> candidate join
                          on (band, band_hash); exact-Jaccard refinement of
                          candidates only.
* SimHash               — 60 conditional bit-sums per doc (pure JVM
                          aggregations), near-dups via banded chunk join.

Every entry is oracle-checked: all content hashes route through md5 (the
one hash Spark and DuckDB compute identically), widened to a 60-bit integer
from the first 15 hex chars, so the MinHash/LSH and SimHash pipelines —
candidate generation AND refinement — are reproduced bit-for-bit in SQL.
Recall vs the exact pair set is additionally validated in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, local_df
from .registry import register

# hash space: Mersenne prime 2^31-1 keeps a*x + b < 2^62 (no int64 overflow
# under Spark 4's ANSI arithmetic) while leaving minhash collision probability
# ~2^-31 — negligible for signature lengths in the tens
P_MERSENNE = (1 << 31) - 1

# intermediates persisted by self_pairs/jaccard_pairs: the returned
# DataFrames are lazy, so the functions themselves can't unpersist (the
# caches back the result plan and are reused across its actions).  They
# route through the shared session cache registry; long-lived sessions
# call ``unpersist_intermediates()`` between iterations to release them.
from ..cache import track as _persist  # noqa: E402
from ..cache import unpersist_tracked as unpersist_intermediates  # noqa: F401, E402


def md5_60(col) -> "F.Column":
    """First 60 bits of md5 as a non-negative int64.

    The cross-engine hash primitive: Spark `conv(substring(md5(x),1,15),16,10)`
    and DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)` produce the same
    integer, which makes every downstream sketch SQL-oracle-able.  15 hex
    chars = 60 bits, so the value always fits a signed int64.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


MD5_60_SQL = "CAST('0x' || substr(md5({col}), 1, 15) AS BIGINT)"


def tokens_df(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.split(F.trim("text"), " +").alias("ws")
    )


def shingles_df(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) with per-doc-distinct n-gram token shingles.

    (NOT widened here: the sub-1k-doc window queries lose more to the
    repartition of text payloads than the explosion serialization costs —
    measured +0.4-0.9 s on ngram/minhash/lsh_pr.  Full-corpus pair-join
    callers widen the docs side themselves: ``jaccard_pairs`` does it
    adaptively on its ``n_docs`` bound.)
    """
    parts = " ,' ',".join(f"element_at(ws, i+{k})" for k in range(n))
    expr = (
        f"array_distinct(transform(sequence(1, size(ws)-{n - 1}), "
        f"i -> concat({parts})))"
    )
    return (
        tokens_df(docs)
        .filter(F.size("ws") >= n)
        .select("doc_id", F.explode(F.expr(expr)).alias("shingle"))
    )


def self_pairs(
    df: DataFrame,
    keys: list[str],
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
    salt: int = 8,
    hot_min: int = 1024,
    max_key_freq: int | None = None,
) -> DataFrame:
    """All (doc_a, doc_b) rows sharing ``keys``, id_a < id_b — skew-salted.

    The default self-equi-join puts every row of a hot key (a boilerplate
    shingle, a near-dup band bucket) on ONE reducer: f rows -> f^2/2 pair
    work in a single task.  Keys at/above ``hot_min`` occurrences are split
    out and joined salted instead — probe side salted by ``hash(id) % salt``,
    build side replicated ``salt`` ways — so each hot key spreads across
    ``salt`` reducers while every unordered pair still meets exactly once
    (the mechanics proven for the spatial join, `operators/spatial.py`).
    Hot keys are <= rows/hot_min distinct values, so their key list always
    broadcasts.  ``salt=None/0`` disables the skew path (plain self-join).

    ``max_key_freq``: a caller-known upper bound on per-key row count.  Most
    dedup callers have one for free — shingles are per-doc-distinct and
    band/chunk tables emit one row per doc, so no key can occur more often
    than there are documents.  When the bound is below ``hot_min`` the hot
    split is provably empty and the function goes straight to the plain
    join, skipping the persist + frequency aggregation + isEmpty action the
    adaptive probe costs (~1.3-1.6x on skew-free inputs at bench scale).

    ``carry``: extra columns duplicated to the output as ``{c}_a``/``{c}_b``.
    """
    out_cols = [
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
        *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry],
    ]

    def plain(rows: DataFrame) -> DataFrame:
        a, b = rows.alias("a"), rows.alias("b")
        cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        for k in keys:
            cond &= F.col(f"a.{k}") == F.col(f"b.{k}")
        return a.join(b, cond).select(*out_cols)

    if not salt or (max_key_freq is not None and max_key_freq < hot_min):
        return plain(df)
    # The split needs key frequencies, so one extra aggregation pass over df
    # is unavoidable; persist so the upstream explosion runs once across the
    # freq pass and the join sides (released via unpersist_intermediates).
    if not df.is_cached:
        df = _persist(df)
    freq = df.groupBy(*keys).agg(F.count("*").alias("f"))
    hot = freq.filter(F.col("f") >= hot_min).select(*keys)
    # Common case: no hot key at all.  Checking costs one action on the
    # already-computed agg (and warms the cache the plain join reuses);
    # taking it skips the whole split/salt machinery — measured ~1.6x
    # overhead when left in place on skew-free inputs.
    if hot.isEmpty():
        return plain(df)
    cold_pairs = plain(df.join(F.broadcast(hot), keys, "left_anti"))
    hot_rows = df.join(F.broadcast(hot), keys, "left_semi")
    a = hot_rows.withColumn(
        "_salt", F.pmod(F.xxhash64(id_col), F.lit(salt)).cast("int")
    ).alias("a")
    b = hot_rows.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).alias("b")
    cond = (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")) & (
        F.col("a._salt") == F.col("b._salt")
    )
    for k in keys:
        cond &= F.col(f"a.{k}") == F.col(f"b.{k}")
    hot_pairs = a.join(b, cond).select(*out_cols)
    return cold_pairs.unionByName(hot_pairs)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    candidates: DataFrame | None = None,
    salt: int = 8,
    hot_min: int = 1024,
    shingles: DataFrame | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via (skew-salted) shingle self-join.

    ``candidates`` (doc_a, doc_b) optionally restricts the pair space (the
    LSH refinement path); otherwise all co-shingled pairs are scored.
    ``shingles`` lets a caller that already exploded (and cached) the
    shingle table reuse it instead of recomputing the explosion.

    Shingles are per-doc-distinct, so per-shingle frequency <= document
    count: one narrow ``docs.count()`` (computed here unless the caller
    passes ``n_docs``) gives ``self_pairs`` its ``max_key_freq`` bound,
    replacing the explosion-wide frequency probe on skew-free inputs.
    """
    if salt and n_docs is None:
        n_docs = docs.count()
    if shingles is None:
        # widen a narrow full-corpus scan before the explosion: a single-
        # row-group parquet source otherwise serializes tokenize+explode
        # (and every read of the persisted shingle table) onto one core.
        # Small window inputs (< hot_min docs) skip it — the payload
        # repartition there costs more than it saves.
        from ..sources.tables import widen

        src = widen(docs) if (n_docs or 0) >= hot_min else docs
        sh = shingles_df(src, n)
    else:
        sh = shingles
    if salt and n_docs >= hot_min and not sh.is_cached:
        sh = _persist(sh)  # reused by sizes + the salted split
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        self_pairs(sh, ["shingle"], salt=salt, hot_min=hot_min, max_key_freq=n_docs)
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"], "left_semi")
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_params(num_hashes: int = 64, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic affine-hash parameters, shared by Spark and oracle SQL."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, P_MERSENNE)), int(rng.integers(0, P_MERSENNE)))
        for _ in range(num_hashes)
    ]


def minhash_signatures(sh: DataFrame, num_hashes: int = 64, seed: int = 42) -> DataFrame:
    """(doc_id, hash_id, minhash): k affine hashes of md5_60(shingle).

    h_i(s) = (a_i * x + b_i) mod 2^31-1 with deterministic (a_i, b_i); the
    k-way expansion is a broadcast cross join (k rows), the min is a single
    hash aggregation — no Python in the loop.
    """
    params = minhash_params(num_hashes, seed)
    x = F.pmod(md5_60("shingle"), F.lit(P_MERSENNE))
    # ONE pass, k min-aggregates wide, then unpivot — no k-way row blowup:
    # the k-param cross join multiplies the shingle stream k times through
    # the shuffle; k parallel partial-min columns reduce map-side to one row
    # per doc per task.  Same values, 10^12-row-friendly plan.
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(P_MERSENNE))
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    wide = sh.withColumn("x", x).groupBy("doc_id").agg(*mins)
    stack = (
        f"stack({num_hashes}, "
        + ", ".join(f"{i}, m{i}" for i in range(num_hashes))
        + ") as (hash_id, minhash)"
    )
    return wide.select("doc_id", F.expr(stack))


def minhash_band_hashes(
    sh: DataFrame, num_hashes: int = 64, bands: int = 16, seed: int = 42
) -> DataFrame:
    """(doc_id, band, bh) straight from the wide per-doc min columns.

    Band ``b`` holds hash_ids {b, b+bands, ...} in ascending order, so its
    key is the md5 of those min columns comma-joined — the identical key
    ``lsh_candidates`` derives from unpivoted signatures, WITHOUT the
    64x stack explosion and the (doc, band) regroup shuffle (one exchange
    and a full re-aggregation pass saved at any scale)."""
    params = minhash_params(num_hashes, seed)
    x = F.pmod(md5_60("shingle"), F.lit(P_MERSENNE))
    mins = [
        F.min(
            F.pmod(F.lit(a) * F.col("x") + F.lit(b), F.lit(P_MERSENNE))
        ).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    wide = sh.withColumn("x", x).groupBy("doc_id").agg(*mins)
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{i}").cast("string")
                        for i in range(num_hashes)
                        if i % bands == b
                    ],
                )
            ).alias("bh"),
        )
        for b in range(bands)
    ]
    return wide.select(
        "doc_id", F.explode(F.array(*entries)).alias("e")
    ).select("doc_id", F.col("e.band").alias("band"), F.col("e.bh").alias("bh"))


def _band_pairs(
    band_hash: DataFrame,
    salt: int = 8,
    hot_min: int = 1024,
    n_docs: int | None = None,
) -> DataFrame:
    """Docs sharing a band bucket (the ``lsh_candidates`` join tail)."""
    return (
        self_pairs(
            band_hash, ["band", "bh"], salt=salt, hot_min=hot_min,
            max_key_freq=n_docs,
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    salt: int = 8,
    hot_min: int = 1024,
    n_docs: int | None = None,
) -> DataFrame:
    """Band the signature, hash each band, join docs sharing a band bucket.

    A hot bucket (thousands of mutual near-dups hashing to one band value)
    is the same mega-reducer shape as a hot shingle — the bucket self-join
    goes through the salted ``self_pairs`` path.  Each doc emits exactly one
    row per band, so per-(band, bh) frequency <= ``n_docs`` — pass it to
    skip the adaptive probe when the corpus is provably below ``hot_min``.

    (Pipelines that own the shingle table use ``minhash_band_hashes`` +
    ``_band_pairs`` instead, skipping the unpivot/regroup; this form stays
    for callers holding already-unpivoted signatures, and pins their
    equality in tests.)
    """
    sig = signatures.withColumn("band", F.col("hash_id") % bands)
    # Band key concatenates minhash values in hash_id order (collect_list is
    # unordered, so sort structs by hash_id first).  Sorting by VALUE instead
    # would bucket permuted signatures together — extra false candidates the
    # refinement then pays to reject.
    band_hash = sig.groupBy("doc_id", "band").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("hash_id", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
            )
        ).alias("bh")
    )
    return _band_pairs(band_hash, salt=salt, hot_min=hot_min, n_docs=n_docs)


def minhash_lsh_dedup(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: candidates then exact refinement.

    The shingle explosion is computed ONCE and cached — it feeds both the
    signature aggregation and the exact-Jaccard refinement (without the
    reuse, the most expensive stage of the pipeline ran twice).  A single
    narrow ``docs.count()`` bounds every key frequency in the pipeline
    (shingle, band bucket), so both self-joins skip their adaptive skew
    probes whenever the corpus is below ``hot_min`` documents.
    """
    n_docs = docs.count()
    sh = shingles_df(docs, n)
    if not sh.is_cached:
        sh = _persist(sh)
    cand = _band_pairs(
        minhash_band_hashes(sh, num_hashes, bands), n_docs=n_docs
    )
    return jaccard_pairs(
        docs, threshold, n, candidates=cand, shingles=sh, n_docs=n_docs
    )


SIMHASH_BITS = 60  # md5_60 token hash width; simhash stays a positive int64


def simhash_df(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 60-bit SimHash from token md5_60, pure JVM aggs."""
    tok = tokens_df(docs).select("doc_id", F.explode("ws").alias("w"))
    tok = tok.withColumn("hv", md5_60("w"))
    bit_sums = [
        F.sum(
            (F.shiftright("hv", b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long")
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash: banded 16-bit chunk join + popcount refine.

    One row per (doc, chunk) means per-(chunk, cv) key frequency <= doc
    count — the narrow count bounds the skew probe away below ``hot_min``.
    """
    n_docs = docs.count()
    sh = simhash_df(docs)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("simhash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", "ck.chunk", "ck.cv")
    cand = (
        self_pairs(chunks, ["chunk", "cv"], carry=("simhash",), max_key_freq=n_docs)
        .withColumnRenamed("simhash_a", "ha")
        .withColumnRenamed("simhash_b", "hb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
              CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dup_rows
       FROM documents""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup accounting via content hash (hash-groupBy shape)."""
    d = load_table(spark, sf_dir, "documents").withColumn("fp", F.md5("text"))
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct"),
        (F.count("*") - F.countDistinct("fp")).alias("n_dup_rows"),
    )


@register(
    "dedup_exact_pairs",
    """WITH base AS (SELECT doc_id, text FROM documents),
       dup AS (SELECT doc_id + 10000 AS doc_id, text FROM base WHERE doc_id < 30),
       u AS (SELECT * FROM base UNION ALL SELECT * FROM dup),
       h AS (SELECT doc_id, md5(text) AS fp FROM u)
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.fp
       FROM h a JOIN h b ON a.fp = b.fp AND a.doc_id < b.doc_id""",
)
def dedup_exact_pairs(spark, sf_dir):
    """Exact-duplicate PAIR LIST via content-hash self-join.

    The driver corpus has no byte-identical rows, so the pair space is
    derived deterministically on BOTH engines: the first 30 documents are
    re-appended under doc_id+10000 with identical text, and the md5
    self-equi-join must recover exactly those 30 (original, copy) pairs —
    a non-vacuous check of the hash-groupBy/join dedup shape (the r3
    aggregate-only twin passed on a single row).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") < 30).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    h = d.unionByName(dup).select("doc_id", F.md5("text").alias("fp"))
    a, b = h.alias("a"), h.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fp"),
        )
    )


@register(
    "ngram_jaccard_pairs",
    """WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
         FROM documents WHERE doc_id < 500
       ), sh AS (
         SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
         FROM toks WHERE len(ws) >= 3
       )
       SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
                    (len(a.shingles) + len(b.shingles)
                     - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
             (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))) >= 0.5""",
)
def ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5) via shingle join.

    ``doc_id < 500`` covers the WHOLE sf0.01 corpus (the driver's
    correctness scale), where the fixture plants 25 near-dup pairs, all
    jaccard >= 0.9 with the next-closest pair at 0.07 — a non-vacuous,
    threshold-stable oracle (the r3 doc_id<150 window saw only 1 pair);
    at larger sf the same predicate keeps the bench cost bounded.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return jaccard_pairs(docs, 0.5, n=3)


def _minhash_oracle() -> str:
    """Full MinHash-LSH pipeline in DuckDB SQL — bit-exact vs the Spark path.

    Reproduces candidate generation (same 64 affine params over md5_60
    shingle hashes, same 16-band md5 bucket keys) AND the exact-Jaccard
    refinement, so the oracle checks the LSH bucketing itself, not just the
    refined score.
    """
    vals = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(minhash_params(64, 42))
    )
    h = MD5_60_SQL.format(col="shingle")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
  FROM documents WHERE doc_id < 500),
shl AS (
  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(ws)-2),
        i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
  FROM toks WHERE len(ws) >= 3),
sh AS (SELECT doc_id, unnest(shingles) AS shingle FROM shl),
xs AS (SELECT doc_id, {h} % 2147483647 AS x FROM sh),
params(hash_id, a, b) AS (VALUES {vals}),
sig AS (
  SELECT doc_id, hash_id,
         MIN((CAST(a AS BIGINT) * x + CAST(b AS BIGINT)) % 2147483647) AS minhash
  FROM xs CROSS JOIN params GROUP BY doc_id, hash_id),
bands AS (
  SELECT doc_id, hash_id % 16 AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_id)) AS bh
  FROM sig GROUP BY doc_id, hash_id % 16),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
scored AS (
  SELECT c.doc_a, c.doc_b,
         ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
               (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
  FROM cand c
  JOIN shl a ON a.doc_id = c.doc_a
  JOIN shl b ON b.doc_id = c.doc_b)
SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.5"""


@register("minhash_lsh_pairs", _minhash_oracle())
def minhash_lsh_pairs(spark, sf_dir):
    """MinHash(64) + LSH(16 bands) near-dup pairs, exact-refined at 0.5.

    Full sf0.01 corpus (doc_id < 500): 25 planted near-dup pairs, all with
    jaccard >= 0.9, so each matches some band with prob ~1-(1-0.9^4)^16 ~ 1
    — the driver check covers candidate generation on a 25-pair set instead
    of the single pair the r3 doc_id<150 window exposed.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return minhash_lsh_dedup(docs, threshold=0.5)


def _simhash_oracle(max_hamming: int = 12) -> str:
    """SimHash pipeline in DuckDB SQL, including the 16-bit-chunk candidate
    condition (a pair only surfaces if SOME chunk matches — the banded join's
    recall contract), so oracle rows == Spark rows exactly."""
    h = MD5_60_SQL.format(col="w")
    sums = ", ".join(
        f"SUM(((hv >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(SIMHASH_BITS)
    )
    sim = " | ".join(
        f"(CAST(CASE WHEN s{b} > 0 THEN 1 ELSE 0 END AS BIGINT) << {b})"
        for b in range(SIMHASH_BITS)
    )
    chunk_cond = " OR ".join(
        f"((a.simhash >> {16 * c}) & 65535) = ((b.simhash >> {16 * c}) & 65535)"
        for c in range(4)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
  FROM documents WHERE doc_id < 500),
tok AS (SELECT doc_id, unnest(ws) AS w FROM toks),
hvs AS (SELECT doc_id, {h} AS hv FROM tok),
bits AS (SELECT doc_id, {sums} FROM hvs GROUP BY doc_id),
sim AS (SELECT doc_id, {sim} AS simhash FROM bits),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
  FROM sim a JOIN sim b ON a.doc_id < b.doc_id
  WHERE {chunk_cond})
SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= {max_hamming}"""


@register("simhash_pairs", _simhash_oracle(4))
def simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (hamming <= 4) via banded chunk join.

    Full sf0.01 corpus + tightened threshold: 24 pairs (the planted
    near-dups land at hamming <= 4; unrelated short texts only collide
    from ~6 up, where the count balloons to 96/325/1215 at 6/8/12).
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return simhash_near_pairs(docs, max_hamming=4).withColumn(
        "hamming", F.col("hamming").cast("long")
    )
