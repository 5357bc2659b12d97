"""Text-analysis operators for training-data pipelines (documents table).

Everything stays JVM-side (built-in ``pyspark.sql.functions``) — no Python
UDFs in the hot path: token counting, quality scoring, language ID
(stopword-hit heuristic), and document fingerprinting (rolling polynomial
hash over tokens, expressed with ``aggregate`` over a split array).

SQL oracles use the exact same formulas so DuckDB reproduces every value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# deterministic stopword sets for the n-gram/stopword language heuristic
EN_STOPWORDS = ("the", "and", "of", "to", "in", "is", "for", "with")
DE_STOPWORDS = ("der", "die", "das", "und", "ist", "nicht", "mit", "ein")
FR_STOPWORDS = ("le", "la", "les", "et", "est", "pour", "dans", "une")


def _stopword_hits_sql(words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    return (
        "len(list_filter(string_split_regex(trim(lower(text)), ' +'), "
        f"w -> w IN ({in_list})))"
    )


def _stopword_hits_spark(words: tuple[str, ...]):
    """Token-set stopword count — identical tokenization in both engines.

    The earlier split-on-' (word) ' counter undercounted CONSECUTIVE
    stopwords (each match consumed the trailing space the next stopword
    needed as its leading space) — identically in both engines, so parity
    could never catch it.  Counting tokens that are members of the set is
    exact.
    """
    toks = F.split(F.trim(F.lower("text")), " +")
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda w: F.array_contains(arr, w)))


@register(
    "token_count",
    """SELECT doc_id,
              CAST(length(string_split_regex(trim(text), ' +')) AS BIGINT) AS n_tokens,
              CAST(length(text) AS BIGINT) AS n_chars_measured,
              n_chars
       FROM documents WHERE doc_id < 200""",
)
def token_count(spark, sf_dir):
    """Whitespace token counting + char length, pure column expressions."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
    )


@register(
    "quality_score",
    """SELECT doc_id,
              ROUND(CAST(length(regexp_replace(text, '[a-z ]', '', 'g')) AS DOUBLE)
                    / length(text), 6) AS punct_ratio,
              ROUND(CAST(length(string_split_regex(trim(text), ' +')) AS DOUBLE)
                    / (length(text) + 1), 6) AS token_density,
              CAST(length(text) BETWEEN 64 AND 4096 AS INTEGER) AS length_ok
       FROM documents""",
)
def quality_score(spark, sf_dir):
    """Quality heuristics: punctuation ratio, token density, length gate."""
    d = load_table(spark, sf_dir, "documents")
    n_nonalpha = F.length(F.regexp_replace("text", "[a-z ]", ""))
    n_tokens = F.size(F.split(F.trim("text"), " +"))
    return d.select(
        "doc_id",
        F.round(n_nonalpha.cast("double") / F.length("text"), 6).alias("punct_ratio"),
        F.round(n_tokens.cast("double") / (F.length("text") + 1), 6).alias(
            "token_density"
        ),
        # plain length compare: Java regex '.' skips newlines, so the old
        # rlike('^.{64,4096}$') diverged from the oracle's length BETWEEN
        # on any text containing a newline
        F.length("text").between(64, 4096).cast("int").alias("length_ok"),
    )


@register(
    "lang_id",
    f"""SELECT doc_id, lang,
              CASE
                WHEN {_stopword_hits_sql(EN_STOPWORDS)} >= {_stopword_hits_sql(DE_STOPWORDS)}
                 AND {_stopword_hits_sql(EN_STOPWORDS)} >= {_stopword_hits_sql(FR_STOPWORDS)}
                 AND {_stopword_hits_sql(EN_STOPWORDS)} > 0 THEN 'en'
                WHEN {_stopword_hits_sql(DE_STOPWORDS)} >= {_stopword_hits_sql(FR_STOPWORDS)}
                 AND {_stopword_hits_sql(DE_STOPWORDS)} > 0 THEN 'de'
                WHEN {_stopword_hits_sql(FR_STOPWORDS)} > 0 THEN 'fr'
                ELSE 'und' END AS lang_pred
       FROM documents WHERE doc_id < 300""",
)
def lang_id(spark, sf_dir):
    """Stopword-hit language heuristic (n-gram-style language ID)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    en = _stopword_hits_spark(EN_STOPWORDS)
    de = _stopword_hits_spark(DE_STOPWORDS)
    fr = _stopword_hits_spark(FR_STOPWORDS)
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
    return d.select("doc_id", "lang", pred.alias("lang_pred"))


_FP_ORACLE = """
SELECT doc_id,
       list_reduce(list_transform(string_split_regex(trim(text), ' +'),
                   w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 1000003),
                   (a, x) -> (a * 131 + x) % 1000003) AS fp_roll,
       md5(text) AS fp_md5
FROM documents WHERE doc_id < 200"""


@register("doc_fingerprint", _FP_ORACLE)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprint: order-sensitive polynomial rolling token hash.

    acc = (acc * 131 + md5_60(token) % P) % P folded over the token stream
    (Rabin-Karp shape) — a transposition-sensitive fingerprint, unlike a
    token-hash sum.  Spark folds with ``aggregate`` from acc0 = 0; DuckDB's
    ``list_reduce`` seeds with the first element, which equals the same
    recurrence because (0 * 131 + x1) % P = x1.  md5 keeps both engines
    bit-identical (see dedup.md5_60).
    """
    from .dedup import md5_60

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tokens = F.split(F.trim("text"), " +")
    tok_hash = F.transform(tokens, lambda w: md5_60(w) % 1000003)
    fp = F.aggregate(
        tok_hash, F.lit(0).cast("long"), lambda a, x: (a * 131 + x) % 1000003
    )
    return d.select("doc_id", fp.alias("fp_roll"), F.md5("text").alias("fp_md5"))


@register(
    "doc_fingerprint_md5",
    """SELECT doc_id, md5(text) AS fp_md5 FROM documents WHERE doc_id < 200""",
)
def doc_fingerprint_md5(spark, sf_dir):
    """Exact-oracle fingerprint: md5 agrees across engines byte-for-byte."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select("doc_id", F.md5("text").alias("fp_md5"))


# BPE-ish pre-tokenizer regex (GPT-2 style, simplified to the common
# subset of Java regex and RE2 so Spark and DuckDB split identically:
# no lookahead, no unicode property classes): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs.
BPE_PATTERN = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

_BPE_SQL = BPE_PATTERN.replace("'", "''")


@register(
    "token_count_bpe",
    f"""SELECT doc_id,
              CAST(len(regexp_extract_all(text, '{_BPE_SQL}')) AS BIGINT)
                  AS n_bpe_tokens,
              CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_SQL}')))
                  AS BIGINT) AS n_distinct,
              CAST(length(string_split_regex(trim(text), ' +')) AS BIGINT)
                  AS n_ws_tokens
       FROM documents WHERE doc_id < 200""",
)
def token_count_bpe(spark, sf_dir):
    """BPE-style pre-tokenization counts next to the whitespace baseline.

    The regex runs JVM-side (``regexp_extract_all``) — the plan stays in
    whole-stage codegen, no Python tokenizer in the loop.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.size(F.split(F.trim("text"), " +")).cast("long").alias("n_ws_tokens"),
    )


# ---------------------------------------------------------------------------
# BM25 relevance scoring (Robertson/Sparck Jones probabilistic ranking)
# ---------------------------------------------------------------------------

BM25_K1, BM25_B = 1.2, 0.75


def bm25_scores(docs, k1: float = BM25_K1, b: float = BM25_B):
    """(doc_id, term, bm25) for every (document, term) pair.

    BM25 (Robertson et al., TREC-3): idf(t) = ln(1 + (N - df + 0.5) /
    (df + 0.5)); score = idf * tf * (k1+1) / (tf + k1 * (1 - b + b *
    dl/avgdl)).  The whole pipeline is JVM-side column algebra.

    Scale shape: tf is one (doc, term) hash aggregation over the exploded
    token stream (map-side partial combine); df is a second aggregation
    over tf's already-deduplicated output — NOT over the raw stream, so a
    10^12-token corpus aggregates its distinct (doc, term) pairs only; the
    corpus stats (N, avgdl) are a single-row broadcast crossJoin; the
    df-to-tf join shuffles on the term key, AQE-coalesced.  All float
    inputs (dl sums, counts) are integers exactly representable in
    doubles, so the scores are plan-order-independent.
    """
    toks = F.split(F.trim(F.lower("text")), " +")
    base = docs.select("doc_id", toks.alias("ws"))
    dl = base.select("doc_id", F.size("ws").alias("dl"))
    stats = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    tok = base.select("doc_id", F.explode("ws").alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    return (
        tf.join(df, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.round(idf * F.col("tf") * (k1 + 1) / denom, 6).alias("bm25"),
        )
    )


@register(
    "bm25_scores",
    """WITH docs AS (
         SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS ws
         FROM documents WHERE doc_id < 60),
       dl AS (SELECT doc_id, len(ws) AS dl FROM docs),
       stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
       tok AS (SELECT doc_id, unnest(ws) AS term FROM docs),
       tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM tok GROUP BY doc_id, term),
       df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term)
       SELECT t.doc_id, t.term,
              ROUND(ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
                    * t.tf * 2.2
                    / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)),
                    6) AS bm25
       FROM tf t JOIN df d USING (term) JOIN dl l ON l.doc_id = t.doc_id
       CROSS JOIN stats s""",
)
def bm25_scores_query(spark, sf_dir):
    """BM25 for every (doc, term) pair over the first 60 documents; the
    oracle replays the identical formula (same ln, same k1/b literals)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return bm25_scores(d)


# ---------------------------------------------------------------------------
# character-entropy quality signal
# ---------------------------------------------------------------------------


def char_entropy(docs):
    """(doc_id, n_chars_e, entropy_nanonats): Shannon entropy of the
    per-document character distribution — the cheap gibberish/boilerplate
    signal next to the repetition and perplexity scores (low entropy =
    repeated filler; high = encrypted/binary junk).

    Uses the same integer-NANONAT quantization as ``operators/lm.py``:
    each character's ``-(c/L) * ln(c/L)`` term quantizes to an int64
    immediately after the transcendental, so the per-document sum is an
    order-free exact integer — plan- and engine-independent.

    Scale shape: one character explode (JVM ``transform`` over an index
    sequence, no Python) and one (doc, char) count aggregation, then a
    per-doc integer sum.
    """
    chars = F.expr(
        "transform(sequence(1, length(text)), i -> substring(text, i, 1))"
    )
    per_char = (
        docs.select("doc_id", F.length("text").alias("L"), F.explode(chars).alias("ch"))
        .groupBy("doc_id", "L", "ch")
        .agg(F.count("*").alias("c"))
    )
    p = F.col("c").cast("double") / F.col("L")
    term = F.expr("CAST(ROUND(-(CAST(c AS DOUBLE) / L) * LN(CAST(c AS DOUBLE) / L) * 1e9) AS BIGINT)")
    return (
        per_char.select("doc_id", "L", term.alias("t"))
        .groupBy("doc_id")
        .agg(F.first("L").alias("n_chars_e"), F.sum("t").alias("entropy_nanonats"))
    )


@register(
    "char_entropy",
    """WITH chars AS (
         SELECT doc_id, length(text) AS L,
                unnest(list_transform(generate_series(1, length(text)),
                                      i -> substring(text, i, 1))) AS ch
         FROM documents),
       pc AS (
         SELECT doc_id, L, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2, 3),
       terms AS (
         SELECT doc_id, L,
                CAST(ROUND(-(CAST(c AS DOUBLE) / L)
                           * LN(CAST(c AS DOUBLE) / L) * 1e9) AS BIGINT) AS t
         FROM pc)
       SELECT doc_id, CAST(MIN(L) AS BIGINT) AS n_chars_e,
              CAST(SUM(t) AS BIGINT) AS entropy_nanonats
       FROM terms GROUP BY doc_id""",
)
def char_entropy_query(spark, sf_dir):
    """Per-document character entropy in exact integer nanonats."""
    d = load_table(spark, sf_dir, "documents")
    return char_entropy(d)
