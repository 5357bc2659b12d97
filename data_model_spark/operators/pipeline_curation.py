"""End-to-end curation pipeline: scrub -> gate -> dedup -> sample -> pack.

The composed query a training-data team actually ships — every stage is
an operator this engine already oracle-checks individually, chained into
one DataFrame plan:

1. PII scrub  (``operators/pii.py``): redacted fingerprint + hit counts;
2. curation gates (``operators/sampling.py:curation_flags``): length,
   punctuation, near-dup canonical (full Jaccard->CC clustering), and
   the stratified content-hash sample;
3. packing (``operators/packing.py``): the KEPT documents concatenate
   into fixed-capacity training sequences — placements computed over the
   post-curation corpus only.

One output row per kept document: its curation provenance (PII hits,
redacted fingerprint) and its packed placement.  The composition is the
point: gates change WHICH documents survive, which changes every
placement downstream, so the driver hash-match verifies the stage
COUPLING, not just each stage alone.

Scale notes: the only additions over the component operators' own plans
are two doc_id equi-joins (scrub results and placements back onto the
kept set) — both co-keyed on the corpus primary key.  No new shuffle
family; the dedup clustering dominates, exactly as it does in the
component query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .packing import CAPACITY, N_SHARDS, pack_sequences
from .pii import augment_with_pii, pii_scrub
from .registry import register
from .sampling import _RATES, _RATES_VALUES, _U, curation_flags

# the packing SQL over the kept subset (mirrors packing._PACK_SQL but its
# source is the curated corpus, not the raw table)
_PACK_KEPT = f"""
pt AS (
  SELECT k.doc_id,
         CAST('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 15) AS BIGINT)
           % {N_SHARDS} AS shard,
         len(string_split_regex(trim(d.text), ' +')) AS n_tok
  FROM kept k JOIN documents d USING (doc_id)
  WHERE len(string_split_regex(trim(d.text), ' +')) > 0
), pc AS (
  SELECT shard, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum_end
  FROM pt
), placed AS (
  SELECT shard, doc_id, n_tok,
         CAST((cum_end - n_tok) // {CAPACITY} AS BIGINT) AS start_seq,
         CAST((cum_end - 1) // {CAPACITY} AS BIGINT) AS end_seq
  FROM pc)"""


def full_curation_pipeline(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, n_pii, red_fp, shard, n_tok, start_seq, end_seq)
    for every document surviving the full gate chain."""
    flags = curation_flags(docs, _RATES)
    kept = flags.filter("keep").select("doc_id", "lang")
    scrub = pii_scrub(augment_with_pii(docs)).select(
        "doc_id",
        (F.col("n_emails") + F.col("n_phones") + F.col("n_urls")).alias(
            "n_pii"
        ),
        "red_fp",
    )
    placed = pack_sequences(docs.join(kept.select("doc_id"), "doc_id")).select(
        "doc_id", "shard", "n_tok", "start_seq", "end_seq"
    )
    return kept.join(scrub, "doc_id").join(placed, "doc_id")


def _oracle() -> str:
    from .components import _COMPONENT_CTES
    from .pii import _PII_ORACLE

    # reuse the registered PII oracle verbatim as a subquery
    return f"""WITH RECURSIVE {_COMPONENT_CTES},
rates(lang, rate_ppm) AS (VALUES {_RATES_VALUES}),
kept AS (
  SELECT d.doc_id, d.lang
  FROM documents d
  LEFT JOIN comps c USING (doc_id)
  LEFT JOIN rates r USING (lang)
  WHERE (length(d.text) BETWEEN 64 AND 4096)
    AND (ROUND(CAST(length(regexp_replace(d.text, '[a-z ]', '', 'g')) AS DOUBLE)
               / length(d.text), 6) <= 0.2)
    AND (c.comp IS NULL OR c.comp = d.doc_id)
    AND ({_U} < COALESCE(r.rate_ppm, 0))
), scrub AS (
  SELECT doc_id, n_emails + n_phones + n_urls AS n_pii, red_fp
  FROM ({_PII_ORACLE}) s
),
{_PACK_KEPT}
SELECT k.doc_id, k.lang, s.n_pii, s.red_fp,
       p.shard, p.n_tok, p.start_seq, p.end_seq
FROM kept k JOIN scrub s USING (doc_id) JOIN placed p USING (doc_id)"""


@register("curation_pipeline", _oracle)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed scrub -> gate -> dedup -> sample -> pack pipeline over
    the documents table (stage coupling verified by the hash match)."""
    return full_curation_pipeline(load_table(spark, sf_dir, "documents"))
