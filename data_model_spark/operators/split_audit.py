"""Split-leakage audit + tokenizer fertility: the release-QA numbers a
training-data pipeline reports beside its splits and tokenizer.

**Leakage audit**: for a split policy, count near-duplicate pairs whose
endpoints landed in DIFFERENT splits — each such pair leaks (eval
member has a train-side near-duplicate).  Audited side by side:
``group`` (the ``operators/splits.py`` cluster-hash policy — provably 0
straddlers) and ``naive`` (per-document hash — the bug the group split
exists to fix; the fixture shows real leakage).  One query returning
both policies' figures makes the guarantee a driver-checked number, not
a docstring claim.

**Tokenizer fertility**: tokens-per-character by language over the
whitespace tokenizer — the standard multilingual tokenizer-quality
audit (fertility spikes flag scripts the tokenizer fragments).  Exact
integer sums; the ratio is one double division per language.

Scale: the audit reuses the bucketed pair generator (never all-pairs)
plus two doc->split joins co-keyed on doc_id; fertility is one
combinable aggregation over a scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .components import _COMPONENT_CTES, connected_components
from .dedup import MD5_60_SQL, jaccard_pairs, md5_60
from .registry import register
from .splits import TRAIN_PCT, VALID_PCT, group_split


def _naive_split(docs: DataFrame) -> DataFrame:
    bucket = F.pmod(
        md5_60(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    )
    return docs.select(
        "doc_id",
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VALID_PCT, "valid")
        .otherwise("test")
        .alias("split"),
    )


def leakage_of(pairs: DataFrame, assign: DataFrame) -> DataFrame:
    """(straddling, total) pair counts of one split assignment."""
    a = assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .agg(
            F.sum((F.col("sa") != F.col("sb")).cast("long")).alias("straddling_pairs"),
            F.count("*").alias("total_pairs"),
        )
    )


def _audit_oracle() -> str:
    h_grp = MD5_60_SQL.format(col="'split:' || CAST(group_key AS VARCHAR)")
    h_doc = MD5_60_SQL.format(col="'split:' || CAST(doc_id AS VARCHAR)")
    return f"""WITH RECURSIVE {_COMPONENT_CTES},
grouped AS (
  SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS group_key
  FROM documents d LEFT JOIN comps c USING (doc_id)),
gsplit AS (
  SELECT doc_id, CASE WHEN {h_grp} % 100 < {TRAIN_PCT} THEN 'train'
                      WHEN {h_grp} % 100 < {TRAIN_PCT + VALID_PCT} THEN 'valid'
                      ELSE 'test' END AS split
  FROM grouped),
nsplit AS (
  SELECT doc_id, CASE WHEN {h_doc} % 100 < {TRAIN_PCT} THEN 'train'
                      WHEN {h_doc} % 100 < {TRAIN_PCT + VALID_PCT} THEN 'valid'
                      ELSE 'test' END AS split
  FROM documents),
audit(policy, straddling_pairs, total_pairs) AS (
  SELECT 'group',
         CAST(SUM(CASE WHEN ga.split != gb.split THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM pairs p JOIN gsplit ga ON p.doc_a = ga.doc_id
               JOIN gsplit gb ON p.doc_b = gb.doc_id
  UNION ALL
  SELECT 'naive',
         CAST(SUM(CASE WHEN na.split != nb.split THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM pairs p JOIN nsplit na ON p.doc_a = na.doc_id
               JOIN nsplit nb ON p.doc_b = nb.doc_id)
SELECT policy, straddling_pairs, total_pairs FROM audit"""


@register("split_leakage_audit", _audit_oracle)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Straddling-pair counts for the group-aware vs naive per-doc split
    over the Jaccard>=0.3 duplicate graph."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, 0.3, n=3).localCheckpoint(eager=False)
    comps = connected_components(pairs)
    grp = group_split(docs, comps).select("doc_id", "split")
    naive = _naive_split(docs)
    g = leakage_of(pairs, grp).select(
        F.lit("group").alias("policy"), "straddling_pairs", "total_pairs"
    )
    n = leakage_of(pairs, naive).select(
        F.lit("naive").alias("policy"), "straddling_pairs", "total_pairs"
    )
    return g.unionByName(n)


_FERT_ORACLE = """SELECT lang,
       CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS BIGINT) AS tokens,
       CAST(SUM(length(text)) AS BIGINT) AS chars,
       ROUND(CAST(SUM(len(string_split_regex(trim(text), ' +'))) AS DOUBLE)
             / SUM(length(text)), 6) AS fertility
FROM documents
GROUP BY lang"""


@register("tokenizer_fertility", _FERT_ORACLE)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens-per-character by language (whitespace tokenizer): exact
    integer sums, one combinable aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), " +")).cast("long")
    return (
        docs.groupBy("lang")
        .agg(
            F.sum(toks).alias("tokens"),
            F.sum(F.length("text").cast("long")).alias("chars"),
        )
        .withColumn(
            "fertility",
            F.round(F.col("tokens").cast("double") / F.col("chars"), 6),
        )
    )
