"""Deterministic sampling + corpus-curation composition.

Training-data pipelines sample by stratum (language, source, quality
bucket) and must do it REPRODUCIBLY: re-running the job, adding
executors, or reordering partitions may not change which rows are kept.
``df.sample()`` cannot promise that (partition-seeded RNG), so sampling
here is content-addressed: a row is kept iff

    md5_60(seed ':' id) % 1e6  <  rate * 1e6

— a pure column expression, independent of physical layout, identical in
DuckDB (the md5_60 cross-engine primitive from ``operators/dedup.py``).

Three operators:

* ``hash_sample``            — flat deterministic Bernoulli-by-hash;
* ``stratified_hash_sample`` — per-stratum rates via a broadcast rate
                               table (the dimension-join shape, not a
                               CASE chain — rates are data, not code);
* ``stratified_topn``        — exactly-n-per-stratum, smallest hash
                               first (a deterministic "reservoir"); the
                               rank filter compiles to WindowGroupLimit,
                               so each stratum keeps a bounded heap
                               per partition rather than a full sort.

``curation_flags`` composes the full keep decision a C4-style cleaning
pass makes: length gate, punctuation-ratio gate, near-dup canonical
selection (connected components over Jaccard pairs), and the stratified
sample — one boolean column per stage so the funnel is inspectable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table, local_df
from .components import canonical_docs, connected_components
from .dedup import jaccard_pairs, md5_60
from .registry import register

RATE_DENOM = 1_000_000


def sample_hash(id_col, seed: str = "s0"):
    """Layout-independent uniform hash in [0, 1e6) from a row id."""
    return md5_60(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    ) % RATE_DENOM


def _sample_hash_sql(id_expr: str, seed: str = "s0") -> str:
    return (
        f"CAST('0x' || substr(md5('{seed}:' || CAST({id_expr} AS VARCHAR)), 1, 15)"
        f" AS BIGINT) % {RATE_DENOM}"
    )


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", seed: str = "s0"
) -> DataFrame:
    """Keep ~rate of rows, chosen by content hash — stable across runs."""
    return df.filter(sample_hash(id_col, seed) < int(rate * RATE_DENOM))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling via a broadcast rate table."""
    spark = df.sparkSession
    rate_df = local_df(
        spark,
        [(k, int(v * RATE_DENOM)) for k, v in sorted(rates.items())],
        f"{stratum_col} STRING, _rate_ppm BIGINT",
    )
    return (
        df.join(F.broadcast(rate_df), stratum_col, "left")
        .withColumn(
            "_rate_ppm",
            F.coalesce("_rate_ppm", F.lit(int(default_rate * RATE_DENOM))),
        )
        .filter(sample_hash(id_col, seed) < F.col("_rate_ppm"))
        .drop("_rate_ppm")
    )


def stratified_topn(
    df: DataFrame,
    n: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, smallest hash first.

    Hash-then-rank is the deterministic analogue of reservoir sampling;
    the ``row_number() <= n`` filter becomes WindowGroupLimit (per-
    partition bounded heaps + one shuffle on the stratum key), so a
    billion-row stratum never sorts fully.
    """
    u = sample_hash(id_col, seed)
    w = Window.partitionBy(stratum_col).orderBy(u, F.col(id_col))
    return (
        df.withColumn("_u", u)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
        .drop("_u")
    )


def curation_flags(
    docs: DataFrame,
    rates: dict[str, float],
    jaccard_threshold: float = 0.3,
    min_len: int = 64,
    max_len: int = 4096,
    max_punct: float = 0.2,
    seed: str = "s0",
) -> DataFrame:
    """Per-document curation funnel: every gate as its own boolean.

    keep = length gate AND punctuation gate AND near-dup canonical AND
    stratified sample.  The near-dup stage is the full clustering path
    (Jaccard pairs -> connected components -> cluster-min canonical).
    """
    canon = canonical_docs(
        docs, connected_components(jaccard_pairs(docs, jaccard_threshold))
    ).select("doc_id", F.col("keep").alias("uniq"))
    spark = docs.sparkSession
    rate_df = local_df(
        spark,
        [(k, int(v * RATE_DENOM)) for k, v in sorted(rates.items())],
        "lang STRING, _rate_ppm BIGINT",
    )
    punct_ratio = F.round(
        F.length(F.regexp_replace("text", "[a-z ]", "")).cast("double")
        / F.length("text"),
        6,
    )
    return (
        docs.join(canon, "doc_id")
        .join(F.broadcast(rate_df), "lang", "left")
        .withColumn("_rate_ppm", F.coalesce("_rate_ppm", F.lit(0)))
        .select(
            "doc_id",
            "lang",
            F.length("text").between(min_len, max_len).alias("len_ok"),
            (punct_ratio <= max_punct).alias("punct_ok"),
            "uniq",
            (sample_hash("doc_id", seed) < F.col("_rate_ppm")).alias("sampled"),
        )
        .withColumn(
            "keep",
            F.col("len_ok") & F.col("punct_ok") & F.col("uniq") & F.col("sampled"),
        )
    )


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_RATES = {"en": 0.5, "de": 1.0, "fr": 0.25, "es": 0.25, "zh": 0.1}

_RATES_VALUES = ", ".join(
    f"('{k}', {int(v * RATE_DENOM)})" for k, v in sorted(_RATES.items())
)

_U = _sample_hash_sql("doc_id")


@register(
    "stratified_sample",
    f"""WITH rates(lang, rate_ppm) AS (VALUES {_RATES_VALUES})
SELECT d.doc_id, d.lang, {_U} AS u
FROM documents d JOIN rates r USING (lang)
WHERE {_U} < r.rate_ppm""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli-by-hash sample."""
    d = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(d, _RATES).select(
        "doc_id", "lang", sample_hash("doc_id").alias("u")
    )


@register(
    "stratified_topn",
    f"""SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk FROM (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_U}, doc_id) AS rk
  FROM documents) WHERE rk <= 10""",
)
def stratified_topn_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 10 docs per language, smallest sample-hash first."""
    d = load_table(spark, sf_dir, "documents")
    return stratified_topn(d, 10).select(
        "lang", "doc_id", F.col("rk").cast("long").alias("rk")
    )


# the curation funnel reuses the recursive component CTEs from
# operators/components.py so the dedup stage oracle is the same
from .components import _COMPONENT_CTES  # noqa: E402


@register(
    "curation_keep",
    f"""WITH RECURSIVE {_COMPONENT_CTES},
rates(lang, rate_ppm) AS (VALUES {_RATES_VALUES})
SELECT d.doc_id, d.lang,
       (length(d.text) BETWEEN 64 AND 4096) AS len_ok,
       (ROUND(CAST(length(regexp_replace(d.text, '[a-z ]', '', 'g')) AS DOUBLE)
              / length(d.text), 6) <= 0.2) AS punct_ok,
       (c.comp IS NULL OR c.comp = d.doc_id) AS uniq,
       ({_U} < COALESCE(r.rate_ppm, 0)) AS sampled,
       ((length(d.text) BETWEEN 64 AND 4096)
        AND (ROUND(CAST(length(regexp_replace(d.text, '[a-z ]', '', 'g')) AS DOUBLE)
                   / length(d.text), 6) <= 0.2)
        AND (c.comp IS NULL OR c.comp = d.doc_id)
        AND ({_U} < COALESCE(r.rate_ppm, 0))) AS keep
FROM documents d
LEFT JOIN comps c USING (doc_id)
LEFT JOIN rates r USING (lang)""",
)
def curation_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation funnel: length, punctuation, near-dup, sample gates."""
    d = load_table(spark, sf_dir, "documents")
    return curation_flags(d, _RATES)


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-ES)
# ---------------------------------------------------------------------------


def weighted_sample(
    df: DataFrame, k: int, weight_col: str, id_col: str = "doc_id",
    seed: str = "w0",
) -> DataFrame:
    """Top-k weighted sample without replacement, fully deterministic.

    A-ES (Efraimidis & Spirakis, IPL 2006): each row draws u ~ U(0,1) and
    ranks by u^(1/w); the k largest are a weighted sample without
    replacement.  Here u is content-addressed (md5_60 of seed:id scaled
    to (0,1]), so the sample is a pure function of (seed, ids, weights) —
    layout- and parallelism-independent, replayable in SQL.  Ranking uses
    the monotone transform ln(u)/w (identical ordering, one log instead
    of a pow), ties broken by id.

    Scale shape: a global top-k — Catalyst plans TakeOrderedAndProject
    (per-partition heaps + tiny final merge), never a full sort.
    """
    u = (
        md5_60(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
        % RATE_DENOM
        + 1
    ) / RATE_DENOM
    key = F.log(u) / F.col(weight_col)
    ranked = df.select(
        F.col(id_col),
        F.col(weight_col),
        key.alias("aes_key"),
    ).orderBy(F.col("aes_key").desc(), F.col(id_col))
    return ranked.limit(k).select(
        id_col, weight_col, F.round("aes_key", 9).alias("aes_key")
    )


def _weighted_oracle(k: int, seed: str = "w0") -> str:
    u = f"(({_sample_hash_sql('doc_id', seed)}) + 1) / {RATE_DENOM}.0"
    return f"""
SELECT doc_id, n_chars, ROUND(ln({u}) / n_chars, 9) AS aes_key
FROM documents
ORDER BY ln({u}) / n_chars DESC, doc_id
LIMIT {k}"""


@register("weighted_sample", _weighted_oracle(25))
def weighted_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """25-doc A-ES weighted sample, n_chars as weight; longer documents
    proportionally likelier, selection replayed exactly in SQL."""
    d = load_table(spark, sf_dir, "documents")
    return weighted_sample(d, 25, "n_chars")
