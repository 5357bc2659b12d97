"""Benchmark decontamination + intra-document repetition signals.

Two curation operators every LLM training pipeline runs that are
distinct from near-dup DEDUP (corpus vs itself):

* ``decontaminate`` — flag training documents sharing any long n-gram
  with an EVALUATION corpus (the GPT-3-style 13-gram wipe, scaled here
  to the fixture's text lengths).  Cross-corpus semi-join on the shingle
  key: eval shingles are tiny relative to the corpus and broadcast; the
  training side streams through map-side.  At 10^12 rows this is the
  same bucketed-equi-join shape as the dedup family — never an
  all-pairs comparison.
* ``repetition_stats`` — Gopher-style repetition ratios per document:
  fraction of duplicate lines, and the fraction of all token bigrams
  taken by the single most frequent bigram.  Pure column expressions +
  one explode/aggregate for the bigram mode (map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .dedup import shingles_df
from .registry import register

NGRAM_N = 5  # fixture texts are short; real deployments use 13


def decontaminate(
    train: DataFrame, eval_docs: DataFrame, n: int = NGRAM_N
) -> DataFrame:
    """(doc_id, contaminated) for every training doc.

    A doc is contaminated iff it shares at least one n-gram shingle with
    the evaluation corpus.  Eval shingles broadcast (eval sets are
    thousands of docs, not billions); the train side is a left-semi join
    probe — no shuffle of the training corpus beyond the shingle hash.
    """
    ev = shingles_df(eval_docs, n).select("shingle").distinct()
    hits = (
        shingles_df(train, n)
        .join(F.broadcast(ev), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("contaminated", F.lit(False)).alias("contaminated")
        )
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, top_bigram_frac) per document."""
    lines = F.filter(
        F.split(F.col("text"), "\n"), lambda s: F.length(F.trim(s)) > 0
    )
    with_lines = docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.round(
            (F.size(lines) - F.size(F.array_distinct(lines)))
            / F.greatest(F.size(lines), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
    )
    toks = docs.select(
        "doc_id", F.split(F.trim("text"), " +").alias("ws")
    ).filter(F.size("ws") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws)-1),"
                " i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))"
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count("*").alias("c"))
    top = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_c"), F.sum("c").alias("total_c")
    )
    return (
        with_lines.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            "dup_line_frac",
            F.round(
                F.coalesce(F.col("top_c") / F.col("total_c"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
    )


# ---------------------------------------------------------------------------
# registered queries — eval set = doc_id >= 450 of the same table (a held
# -out benchmark slice), train = doc_id < 450
# ---------------------------------------------------------------------------

_SHINGLE_SQL = """
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(ws) - {nm1}),
           i -> {concat}))) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
        FROM documents WHERE {pred}) t
  WHERE len(ws) >= {n}"""


def _shingle_cte(pred: str, n: int = NGRAM_N) -> str:
    concat = " || ' ' || ".join(f"ws[i+{k}]" for k in range(n))
    return _SHINGLE_SQL.format(nm1=n - 1, concat=concat, pred=pred, n=n)


@register(
    "decontaminate",
    f"""WITH ev AS (SELECT DISTINCT shingle FROM ({_shingle_cte('doc_id >= 450')})),
tr AS ({_shingle_cte('doc_id < 450')}),
hits AS (SELECT DISTINCT tr.doc_id FROM tr JOIN ev USING (shingle))
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id < 450) d
LEFT JOIN hits h USING (doc_id)""",
)
def decontaminate_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training docs sharing a 5-gram with the held-out eval slice."""
    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") < 450), docs.filter(F.col("doc_id") >= 450)
    )


@register(
    "repetition_stats",
    """WITH lines AS (
  SELECT doc_id,
         list_filter(string_split(text, chr(10)), s -> len(trim(s)) > 0) AS ls
  FROM documents WHERE doc_id < 200),
line_stats AS (
  SELECT doc_id, len(ls) AS n_lines,
         ROUND(CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
               / GREATEST(len(ls), 1), 6) AS dup_line_frac
  FROM lines),
bigrams AS (
  SELECT doc_id, unnest(list_transform(generate_series(1, len(ws)-1),
         i -> ws[i] || ' ' || ws[i+1])) AS bg
  FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS ws
        FROM documents WHERE doc_id < 200) t
  WHERE len(ws) >= 2),
counts AS (SELECT doc_id, bg, COUNT(*) AS c FROM bigrams GROUP BY doc_id, bg),
top AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS total_c
        FROM counts GROUP BY doc_id)
SELECT l.doc_id, CAST(l.n_lines AS BIGINT) AS n_lines, l.dup_line_frac,
       ROUND(COALESCE(CAST(t.top_c AS DOUBLE) / t.total_c, 0.0), 6)
           AS top_bigram_frac
FROM line_stats l LEFT JOIN top t USING (doc_id)""",
)
def repetition_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition ratios over the documents table."""
    return repetition_stats(
        load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    )
