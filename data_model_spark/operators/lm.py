"""Bigram-LM perplexity scoring for quality filtering (CCNet-style).

Production pipelines score documents with a language model and drop the
high-perplexity tail (Wenzek et al., CCNet).  The external KenLM is not in
this container, so the scorer trains its own add-one-smoothed bigram model
ON the corpus — the join topology (document n-grams against a count table)
is exactly what an externally-trained count table would use, and every
quantity is deterministic and SQL-replayable:

* counts are exact integers from map-side-combinable groupBys;
* each bigram's log-probability is quantized to integer NANONATS —
  ``CAST(ROUND(LN((c2+1)/(c1+V)) * 1e9) AS BIGINT)`` — immediately after
  the only transcendental step, so the per-document aggregation is an
  ORDER-FREE exact integer sum (cross-engine float summation order can
  never matter);
* perplexity is one EXP over identical doubles, rounded to 6.

Scale shape: the bigram-count join is a key-partitioned equi-join against
an aggregated (hence bounded-by-vocabulary²) table; the prefix-count and
vocabulary-size sides are far smaller aggregates.  No Python UDFs at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

NANO = 1_000_000_000.0


def bigram_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, b, w1): every adjacent token pair, with multiplicity."""
    ws = F.split(F.trim(F.lower("text")), " +")
    return (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws)-1), i -> struct("
                    "concat(element_at(ws, i), ' ', element_at(ws, i+1)) AS b,"
                    " element_at(ws, i) AS w1))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.b", "g.w1")
    )


def bigram_model(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(C2, C1, V): bigram counts, prefix counts, vocabulary size (1 row)."""
    bg = bigram_stream(docs)
    c2 = bg.groupBy("b").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    ws = F.split(F.trim(F.lower("text")), " +")
    v = (
        docs.select(F.explode(ws).alias("w"))
        .filter(F.col("w") != "")
        .agg(F.countDistinct("w").alias("v"))
    )
    return c2, c1, v


def perplexity(docs: DataFrame, model: tuple[DataFrame, DataFrame, DataFrame] | None = None) -> DataFrame:
    """Per-document add-one bigram perplexity: (doc_id, n_bigrams, nll_nano, ppl).

    ``model`` defaults to training on ``docs`` itself (self-scoring); pass
    counts from a held-out corpus for true CCNet-style filtering — the
    scoring plan is identical.  Unknown bigrams/prefixes (possible only
    with an external model) back off to zero counts via the left joins.
    """
    if model is None:
        model = bigram_model(docs)
    c2, c1, v = model
    bg = bigram_stream(docs)
    scored = (
        bg.join(c2, "b", "left")
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce("c2", F.lit(0)) + F.lit(1.0))
                    / (F.coalesce("c1", F.lit(0)) + F.col("v"))
                )
                * F.lit(NANO),
                0,
            )
            .cast("long")
            .alias("lp_nano"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (-F.sum("lp_nano")).alias("nll_nano"),
    ).select(
        "doc_id",
        "n_bigrams",
        "nll_nano",
        F.round(
            F.exp(F.col("nll_nano").cast("double") / F.lit(NANO) / F.col("n_bigrams")),
            6,
        ).alias("ppl"),
    )


_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS ws
  FROM documents
  WHERE length(string_split_regex(trim(lower(text)), ' +')) >= 2),
bg_s AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
                 i -> ws[i] || ' ' || ws[i+1])) AS b,
         unnest(list_transform(generate_series(1, len(ws)-1), i -> ws[i])) AS w1
  FROM toks),
c2 AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg_s GROUP BY b),
c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg_s GROUP BY w1),
vocab AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS w
    FROM documents) WHERE w != ''),
scored AS (
  SELECT g.doc_id,
         CAST(ROUND(LN((COALESCE(c2.c2, 0) + 1.0) / (COALESCE(c1.c1, 0) + vocab.v))
                    * 1000000000.0) AS BIGINT) AS lp_nano
  FROM bg_s g
  LEFT JOIN c2 ON c2.b = g.b
  LEFT JOIN c1 ON c1.w1 = g.w1
  CROSS JOIN vocab),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(-SUM(lp_nano) AS BIGINT) AS nll_nano
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_bigrams, nll_nano,
       ROUND(EXP(CAST(nll_nano AS DOUBLE) / 1000000000.0 / n_bigrams), 6) AS ppl
FROM agg"""


@register("lm_perplexity", _LM_ORACLE)
def lm_perplexity(spark, sf_dir):
    """Self-trained add-one bigram perplexity for every document."""
    return perplexity(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def pmi_collocations(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """(w1, w2, c_xy, pmi): pointwise mutual information of adjacent
    token pairs (Church & Hanks 1990) — the collocation signal next to
    the perplexity scorer (multi-word expressions, boilerplate phrases).

    pmi = ln( P(xy) / (P(x) P(y)) ) with P from exact corpus counts;
    computed as ``ln((c_xy * N * N) / (M * c_x * c_y))`` over doubles in
    a fixed expression order, so both engines evaluate identical IEEE
    trees.  ``min_count`` drops the unstable low-count tail (standard
    practice, and it bounds the output by the frequent-bigram set).

    Scale shape: two map-side-combinable count aggregations (bigrams,
    unigrams), two broadcast-able scalar totals, and two equi-joins of
    the bigram count table against the (vocabulary-sized) unigram table
    on w1/w2 keys.  No Python UDFs.
    """
    ws = F.split(F.trim(F.lower("text")), " +")
    toks = docs.select("doc_id", ws.alias("ws"))
    uni = toks.select(F.explode("ws").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    n_tok = uni.agg(F.sum("c").alias("n"))
    big = (
        toks.filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws)-1), i -> struct("
                    "element_at(ws, i) AS w1, element_at(ws, i+1) AS w2))"
                )
            ).alias("g")
        )
        .groupBy("g.w1", "g.w2")
        .agg(F.count("*").alias("c_xy"))
    )
    m_big = big.agg(F.sum("c_xy").alias("m"))
    j = (
        big.filter(F.col("c_xy") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .crossJoin(F.broadcast(m_big))
    )
    num = F.col("c_xy").cast("double") * F.col("n") * F.col("n")
    den = F.col("m").cast("double") * F.col("c_x") * F.col("c_y")
    return j.select(
        "w1", "w2", "c_xy", F.round(F.log(num / den), 6).alias("pmi")
    )


_PMI_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS ws
  FROM documents),
uni AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY w),
n_tok AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
big AS (
  SELECT split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
         CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                                     i -> ws[i] || ' ' || ws[i + 1])) AS b
        FROM toks WHERE len(ws) >= 2)
  GROUP BY 1, 2),
m_big AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS m FROM big)
SELECT b.w1, b.w2, b.c_xy,
       ROUND(LN((CAST(b.c_xy AS DOUBLE) * n.n * n.n)
                / (CAST(m.m AS DOUBLE) * ux.c * uy.c)), 6) AS pmi
FROM big b
JOIN uni ux ON ux.w = b.w1
JOIN uni uy ON uy.w = b.w2
CROSS JOIN n_tok n CROSS JOIN m_big m
WHERE b.c_xy >= 5"""


@register("pmi_collocations", _PMI_ORACLE)
def pmi_collocations_query(spark, sf_dir):
    """PMI of adjacent token pairs over the corpus, count >= 5; oracle
    replays the identical count joins and IEEE expression tree."""
    d = load_table(spark, sf_dir, "documents")
    return pmi_collocations(d)
