"""Fuzzy (edit-distance <= 1) self-join via deletion-neighborhood
blocking — entity resolution / typo-duplicate detection at scale.

The string companion to the MinHash/SimHash near-dup family: find all
record pairs whose keys differ by at most one edit (substitution,
insertion, deletion).  All-pairs Levenshtein is quadratic; the deletion
neighborhood (cf. Mor & Fraenkel 1982; FastSS) makes it ONE equi-join:

    keys(s) = {s} union {s with one character deleted}

Two strings at edit distance <= 1 always share a key — a substitution
at position i gives del_i(s) = del_i(t); an insertion into s gives
del_j(t) = s, and s itself is in keys(s) — so candidate generation is
provably complete; the exact JVM ``levenshtein`` refine removes the
false positives (strings sharing a deletion at DIFFERENT positions can
be distance 2).  A candidate pair can share several keys, so the
candidate set dedupes on the pair id before the refine (output-sized
shuffle).

Determinism contract: keys are pure string slicing, the refine is the
exact integer edit distance — plan-independent; the oracle is the
brute-force quadratic join, so a driver match proves candidate
COMPLETENESS, not just refine agreement.

Scale shape: the |s|+1-way key explode happens map-side (pure JVM
``transform(sequence(...))``) before the one key shuffle; hot keys
(shared deletions of very frequent strings) fan out like any blocking
join — AQE skew splitting applies.  Length caps keep the explode
bounded: keys per row = len + 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def editdist1_join(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """(id_a, id_b, dist): unordered pairs whose ``s_col`` strings are
    at Levenshtein distance <= 1, found via deletion-key blocking."""
    base = df.select(F.col(id_col).alias("id"), F.col(s_col).alias("s"))
    keys = base.select(
        "id", "s",
        F.explode(
            F.concat(
                F.array(F.col("s")),
                F.expr(
                    "transform(sequence(1, length(s)), "
                    "i -> concat(substring(s, 1, i - 1), substring(s, i + 1)))"
                ),
            )
        ).alias("k"),
    )
    a = keys.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"), "k")
    b = keys.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"), "k")
    cand = (
        a.join(b, "k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    return cand.select(
        "id_a", "id_b", F.levenshtein("s_a", "s_b").alias("dist")
    ).filter(F.col("dist") <= 1)


_FUZZY_ORACLE = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE a.c_custkey < 500 AND b.c_custkey < 500
  AND levenshtein(a.c_name, b.c_name) <= 1"""


@register("fuzzy_name_pairs", _FUZZY_ORACLE)
def fuzzy_name_pairs(spark, sf_dir):
    """Customer-name pairs at edit distance <= 1 (names differing in a
    single digit; custkey < 500 -> 5500 pairs at sf0.01); the oracle is
    the brute-force quadratic Levenshtein join, so the driver match
    proves deletion-key candidate completeness."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .select("c_custkey", "c_name")
    )
    return editdist1_join(cust, "c_custkey", "c_name")
