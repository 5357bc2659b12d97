"""Snapshot diff (anti-entropy / fixity check) between two table states.

The resumable-write machinery (``operators/resume.py``) trusts its own
checkpoint log; a 100 TB store ALSO needs the untrusting audit — "what
actually differs between yesterday's snapshot and today's?" — without
shipping either table across the wire.  Classic two-level anti-entropy
(the Merkle-style sync DynamoDB-style systems document publicly):

1. **Range fingerprints** — both sides aggregate
   ``(count, sum(md5_60(content)))`` per id-range bucket (one map-side
   combinable aggregation each, output = n_ranges rows).  Integer sums
   commute, so the fingerprint is plan-independent.
2. **Prune** — ranges with equal fingerprints are PROVABLY equal-ish
   (md5-sum collision odds ~2^-60 per range) and drop out; only dirty
   ranges proceed.
3. **Detail diff** — rows of dirty ranges full-outer join on id:
   ``added`` (right only), ``removed`` (left only), ``changed``
   (both, fingerprints differ).

At a daily-churn workload the dirty fraction is tiny, so the expensive
row-level join touches a sliver of either table; the DuckDB oracle
computes the same statuses directly (the pruning provably never changes
the answer, modulo the stated collision odds — and the oracle would
catch a collision as a mismatch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fixture_range, load_table
from .dedup import MD5_60_SQL, md5_60
from .registry import register


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    content_col,
    range_size: int = 64,
) -> DataFrame:
    """(id, status) for every row differing between snapshots ``a`` -> ``b``.

    ``content_col``: string column (or expression name) identifying row
    content; rows compare by ``md5_60`` of it.  ``range_size``: ids per
    fingerprint bucket.
    """

    def prep(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            md5_60(F.col(content_col)).alias(f"fp_{side}"),
            (F.col(id_col) / range_size).cast("long").alias("rng"),
        )

    pa, pb = prep(a, "a"), prep(b, "b")
    # range sums reduce fingerprints mod 2^55 so range_size <= 256 sums
    # stay under 2^63 (ANSI overflow); detection strength ~2^-55 per range
    m = F.lit(1 << 55)
    fa = pa.groupBy("rng").agg(
        F.count("*").alias("n_a"), F.sum(F.pmod("fp_a", m)).alias("s_a")
    )
    fb = pb.groupBy("rng").agg(
        F.count("*").alias("n_b"), F.sum(F.pmod("fp_b", m)).alias("s_b")
    )
    dirty = (
        fa.join(fb, "rng", "full_outer")
        .filter(
            (F.col("n_a").isNull())
            | (F.col("n_b").isNull())
            | (F.col("n_a") != F.col("n_b"))
            | (F.col("s_a") != F.col("s_b"))
        )
        .select("rng")
    )
    # dirty grows with the churn between snapshots (a full rewrite makes it
    # every range): no forced broadcast — AQE picks broadcast when small
    da = pa.join(dirty, "rng", "left_semi")
    db = pb.join(dirty, "rng", "left_semi")
    joined = da.select("id", "fp_a").join(
        db.select(F.col("id").alias("id_b"), "fp_b"),
        F.col("id") == F.col("id_b"),
        "full_outer",
    )
    return joined.select(
        F.coalesce("id", "id_b").alias("id"),
        F.when(F.col("id").isNull(), F.lit("added"))
        .when(F.col("id_b").isNull(), F.lit("removed"))
        .when(F.col("fp_a") != F.col("fp_b"), F.lit("changed"))
        .alias("status"),
    ).filter(F.col("status").isNotNull())


# ---------------------------------------------------------------------------
# registered query: documents vs a deterministically mutated snapshot
# ---------------------------------------------------------------------------

# mutation recipe (both engines): drop id%97==0, rewrite text for id%89==0,
# append 15 fresh ids at 20000+
_B_CTE = """
snap_b AS (
  SELECT doc_id, CASE WHEN doc_id % 89 = 0 THEN text || ' [rev2]' ELSE text END AS text
  FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT 20000 + i AS doc_id, 'new document ' || CAST(i AS VARCHAR) AS text
  FROM generate_series(0, 14) t(i))"""

_DIFF_ORACLE = f"""
WITH {_B_CTE[1:]},
fa AS (SELECT doc_id, {MD5_60_SQL.format(col="text")} AS fp FROM documents),
fb AS (SELECT doc_id, {MD5_60_SQL.format(col="text")} AS fp FROM snap_b)
SELECT COALESCE(fa.doc_id, fb.doc_id) AS id,
       CASE WHEN fa.doc_id IS NULL THEN 'added'
            WHEN fb.doc_id IS NULL THEN 'removed'
            WHEN fa.fp <> fb.fp THEN 'changed' END AS status
FROM fa FULL OUTER JOIN fb ON fa.doc_id = fb.doc_id
WHERE (fa.doc_id IS NULL OR fb.doc_id IS NULL OR fa.fp <> fb.fp)"""


def _snap_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    kept = d.filter(F.pmod("doc_id", F.lit(97)) != 0).select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(89)) == 0, F.concat("text", F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    fresh = fixture_range(spark, 15).select(
        (F.col("id") + 20000).alias("doc_id"),
        F.concat(F.lit("new document "), F.col("id").cast("string")).alias("text"),
    )
    return kept.unionByName(fresh)


@register("snapshot_diff", _DIFF_ORACLE)
def snapshot_diff_query(spark, sf_dir):
    """Two-level anti-entropy diff of documents vs its mutated snapshot;
    the oracle computes statuses directly, proving the range-fingerprint
    pruning never changes the answer."""
    a = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return snapshot_diff(a, _snap_b(spark, sf_dir), "doc_id", "text")
