"""Inverted index + positional phrase search over the document corpus.

The retrieval face of the text suite (BM25 scores terms; this finds
exact phrases): build positional posting lists, then answer a k-term
phrase query by joining the k posting tables per doc and checking
position adjacency — the standard positional-index evaluation every IR
textbook documents (Manning et al., IIR ch. 2).

Scale shape: postings build is ONE (term, doc) aggregation over the
posexploded token stream (map-side combinable; per-(term,doc) position
lists are bounded by document length).  A k-term phrase touches only
the k terms' postings — the index join is keyed on doc_id after a
term-pruned scan, never a corpus scan; adjacency is a JVM array filter
over the joined position lists.  Everything deterministic (integer
positions, sorted arrays).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def build_postings(docs: DataFrame) -> DataFrame:
    """(term, doc_id, positions): sorted 0-based token positions."""
    ws = F.split(F.trim(F.lower("text")), " +")
    return (
        docs.select("doc_id", F.posexplode(ws).alias("pos", "term"))
        .groupBy("term", "doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def phrase_match(postings: DataFrame, phrase: str) -> DataFrame:
    """(doc_id, n_hits): documents containing the phrase's tokens
    adjacently, with the exact occurrence count (overlaps included)."""
    terms = phrase.strip().lower().split()
    if not terms:
        raise ValueError("empty phrase")
    base = postings.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("positions").alias("p0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias(f"p{i}")
        )
        base = base.join(nxt, "doc_id")
    def adjacent(p):
        conds = [
            F.array_contains(F.col(f"p{i}"), p + i)
            for i in range(1, len(terms))
        ]
        out = conds[0] if conds else F.lit(True)
        for c in conds[1:]:
            out = out & c
        return out

    hit = F.filter(F.col("p0"), adjacent)
    return (
        base.select("doc_id", F.size(hit).alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )


_PHRASE = "table hash"

_PHRASE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS ws
  FROM documents),
hits AS (
  SELECT doc_id,
         len(list_filter(generate_series(1, len(ws) - 1),
             i -> ws[i] = 'table' AND ws[i + 1] = 'hash')) AS n_hits
  FROM toks)
SELECT doc_id, CAST(n_hits AS BIGINT) AS n_hits FROM hits WHERE n_hits > 0"""


@register("phrase_search", _PHRASE_ORACLE)
def phrase_search(spark, sf_dir):
    """Positional-index phrase search for '{_PHRASE}' (the corpus' most
    frequent bigram — 46 matching docs at sf0.01); the oracle counts
    adjacent occurrences by direct token scan, so index build, term
    pruning, doc join, and adjacency filter are all checked."""
    d = load_table(spark, sf_dir, "documents")
    return phrase_match(build_postings(d), _PHRASE)
