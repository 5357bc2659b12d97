"""Leakage-free train/valid/test splitting: near-duplicate clusters never
straddle split boundaries.

A random per-document split leaks training data into eval whenever two
near-duplicates land on different sides — the classic contamination bug
a dedup pipeline exists to prevent (the decontamination companion of
``operators/decontaminate.py``, which guards against a FIXED eval set;
this operator makes the pipeline's OWN held-out splits safe).  The rule:
the split is a pure hash of the duplicate-cluster canonical id, so every
member of a cluster — and trivially every singleton — gets the same
assignment, and the assignment is reproducible from the corpus alone
(no stored split table, no RNG state).

Scale design:

* clusters come from the existing candidate-bucketed pair generator +
  large/small-star connected components (never all-pairs; see
  ``operators/dedup.py`` / ``components.py``);
* the split is one narrow projection after a single doc->component
  left join — the ``canonical_docs`` join shape, NOT hint-forced (the
  comps side grows with the corpus dup rate; AQE chooses);
* the hash is the cross-engine ``md5_60`` primitive, so DuckDB replays
  the full pipeline (recursive-CTE closure + identical hash arithmetic)
  bit-exactly — the driver hash-checks doc-level assignments, and the
  no-straddle property is structural (split depends only on group_key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .components import _COMPONENT_CTES, connected_components
from .dedup import MD5_60_SQL, jaccard_pairs, md5_60
from .registry import register

#: percent buckets: [0, TRAIN) train, [TRAIN, TRAIN+VALID) valid, rest test
TRAIN_PCT, VALID_PCT = 90, 5


def group_split(docs: DataFrame, comps: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """Assign (doc, group_key, bucket, split): group_key is the duplicate
    cluster's canonical id (the doc itself for singletons); the split is
    ``md5_60('split:' || group_key) % 100`` cut at 90/95."""
    c = comps.select(F.col("node").alias(id_col), "comp")
    bucket = F.pmod(
        md5_60(F.concat(F.lit("split:"), F.col("group_key").cast("string"))),
        F.lit(100),
    )
    return (
        docs.join(c, id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("group_key"),
        )
        .withColumn("bucket", bucket)
        .withColumn(
            "split",
            F.when(F.col("bucket") < TRAIN_PCT, "train")
            .when(F.col("bucket") < TRAIN_PCT + VALID_PCT, "valid")
            .otherwise("test"),
        )
    )


def _oracle() -> str:
    h = MD5_60_SQL.format(col="'split:' || CAST(group_key AS VARCHAR)")
    return f"""WITH RECURSIVE {_COMPONENT_CTES},
grouped AS (
  SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS group_key
  FROM documents d LEFT JOIN comps c USING (doc_id)),
bucketed AS (
  SELECT doc_id, group_key, {h} % 100 AS bucket FROM grouped)
SELECT doc_id, group_key, bucket,
       CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VALID_PCT} THEN 'valid'
            ELSE 'test' END AS split
FROM bucketed"""


@register("leakage_free_split", _oracle)
def leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware split over the documents corpus: Jaccard>=0.3 dup
    clusters (the ``dedup_components`` graph) share one assignment."""
    docs = load_table(spark, sf_dir, "documents")
    comps = connected_components(jaccard_pairs(docs, 0.3, n=3))
    return group_split(docs, comps)
