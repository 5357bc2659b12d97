"""Domain mixing weights — temperature-smoothed corpus sampling rates.

Multi-source pretraining corpora are not sampled proportionally: the
standard recipe (multilingual BERT / XLM-R, mC4) smooths the natural
source distribution ``p_i = n_i / N`` with a temperature exponent,
``w_i ∝ p_i^alpha`` (alpha < 1 upsamples the tail), then renormalizes.
The per-source "effective epochs" ``w_i / p_i`` says how many times a
source's data is traversed per corpus epoch — the number a data-loading
plan is actually built from.

Scale shape: ONE count aggregation over the corpus (map-side combining,
one shuffle of |sources| rows) and arithmetic on the tiny per-source
table.  Spark never collects; the normalizing denominator is a window
sum over the source rows (a few hundred rows at worst — one tiny
exchange).

Cross-engine exactness: alpha is fixed at 0.5 so the smoothing is
``sqrt`` — an IEEE-754 correctly-rounded operation that Spark (JVM) and
DuckDB (libm) compute bit-identically, unlike ``pow(x, 0.3)`` which only
promises 1-ulp accuracy and may differ between engines.  The smoothed
mass is then lattice-quantized to an int64 (``floor(sqrt(p)*1e12 +
0.5)``) so the denominator is an EXACT integer sum — no
float-accumulation-order dependence — and every derived ratio is a
correctly-rounded double of two deterministic operands, rounded HALF_UP
at 6 decimals in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

Q = 10**12  # quantization lattice for the smoothed mass


def domain_mix_weights(
    docs: DataFrame, stratum_col: str = "source"
) -> DataFrame:
    """Per-source natural share, sqrt-temperature weight, effective epochs."""
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("n_docs"))
    w_all = Window.partitionBy()
    total = F.sum("n_docs").over(w_all)
    q = F.floor(F.sqrt(F.col("n_docs") / total) * Q + F.lit(0.5)).cast("long")
    denom = F.sum(q).over(w_all)
    p = F.col("n_docs") / total
    w = q / denom
    return counts.select(
        stratum_col,
        "n_docs",
        F.round(p, 6).alias("p_nat"),
        F.round(w, 6).alias("w_mix"),
        F.round(w / p, 6).alias("epochs"),
    )


_MIX_ORACLE = f"""
WITH c AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
), q AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER ()) * {Q}
                    + 0.5) AS BIGINT) AS qm,
         CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS p_nat
  FROM c
)
SELECT source, n_docs,
       ROUND(p_nat, 6) AS p_nat,
       ROUND(CAST(qm AS DOUBLE) / SUM(qm) OVER (), 6) AS w_mix,
       ROUND((CAST(qm AS DOUBLE) / SUM(qm) OVER ()) / p_nat, 6) AS epochs
FROM q"""


@register("domain_mix_weights", _MIX_ORACLE)
def domain_mix_weights_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt-temperature mixing weights over the 20 document sources."""
    docs = load_table(spark, sf_dir, "documents")
    return domain_mix_weights(docs)
