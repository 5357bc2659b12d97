"""Pairwise Wasserstein-1 (earth mover's) distance between per-group
1-D integer distributions — corpus drift monitoring.

The standard training-data curation signal: how far has source B's
length/quality/score distribution moved from source A's (or today's
shard from yesterday's)?  For 1-D distributions W1 has the closed form
``integral |F_a - F_b|`` over the value axis, which distributes as pure
relational algebra — no transport solver.

Determinism contract: with integer values and counts, every CDF step is
exact: per-(group, v) counts, a zero-filled cumulative count ``cum`` on
the shared value lattice, and the term ``|cum_a * n_b - cum_b * n_a| *
(v_next - v)`` — the common-denominator form of |F_a - F_b| * dv —
summed in decimal(38,0) (cum * n overflows int64 at 10^12-row scale).
The single final division by n_a * n_b is the only float; both engines
divide the same exact integers, so results are identical IEEE doubles.

Scale shape: one map-side-combinable groupBy(group, v) count; the value
LATTICE is the distinct-value set — bounded by the value domain, not the
row count (callers bin wide domains first, as ``otsu_scan``), so the
lattice windows are bounded state; the group x lattice CDF frame shuffles
on group; the pair join is keyed on v with groups-squared fan-out —
groups are sources/shards (hundreds), not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


def w1_pairs(df: DataFrame, group: str = "g", value: str = "v") -> DataFrame:
    """(g_a, g_b, n_a, n_b, w1): exact pairwise Wasserstein-1 distances
    between the per-group empirical distributions of an integer column."""
    counts = (
        df.select(F.col(group).alias("g"), F.col(value).alias("v"))
        .groupBy("g", "v")
        .agg(F.count("*").alias("cnt"))
    )
    lattice = (
        counts.select("v")
        .distinct()
        .withColumn("dv", F.lead("v").over(Window.orderBy("v")) - F.col("v"))
        .filter(F.col("dv").isNotNull())
    )
    groups = counts.select("g").distinct()
    grid = groups.crossJoin(F.broadcast(lattice))
    cdf = (
        grid.join(counts, ["g", "v"], "left")
        .select(
            "g", "v", "dv",
            F.sum(F.coalesce("cnt", F.lit(0)))
            .over(
                Window.partitionBy("g")
                .orderBy("v")
                .rowsBetween(Window.unboundedPreceding, 0)
            )
            .alias("cum"),
        )
    )
    sizes = counts.groupBy("g").agg(F.sum("cnt").alias("n"))
    c = cdf.join(F.broadcast(sizes), "g")
    a = c.select(
        F.col("g").alias("g_a"), "v", "dv",
        F.col("cum").alias("cum_a"), F.col("n").alias("n_a"),
    )
    b = c.select(
        F.col("g").alias("g_b"), F.col("v").alias("v2"),
        F.col("cum").alias("cum_b"), F.col("n").alias("n_b"),
    )
    terms = (
        a.join(b, (F.col("v") == F.col("v2")) & (F.col("g_a") < F.col("g_b")))
        .select(
            "g_a", "g_b", "n_a", "n_b",
            (
                F.abs(
                    F.col("cum_a").cast("decimal(38,0)") * F.col("n_b")
                    - F.col("cum_b").cast("decimal(38,0)") * F.col("n_a")
                )
                * F.col("dv")
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("g_a", "g_b", "n_a", "n_b")
        .agg(F.sum("term").alias("s"))
        .select(
            "g_a", "g_b", "n_a", "n_b",
            (
                F.col("s").cast("double")
                / (F.col("n_a").cast("decimal(38,0)") * F.col("n_b")).cast("double")
            ).alias("w1"),
        )
    )


_W1_ORACLE = """
WITH counts AS (
  SELECT source AS g, n_chars AS v, COUNT(*) AS cnt FROM documents GROUP BY 1, 2),
lattice AS (
  SELECT v, LEAD(v) OVER (ORDER BY v) - v AS dv
  FROM (SELECT DISTINCT v FROM counts)),
lat AS (SELECT v, dv FROM lattice WHERE dv IS NOT NULL),
grid AS (SELECT g.g, l.v, l.dv FROM (SELECT DISTINCT g FROM counts) g CROSS JOIN lat l),
cdf AS (
  SELECT gr.g, gr.v, gr.dv,
         SUM(COALESCE(c.cnt, 0)) OVER (PARTITION BY gr.g ORDER BY gr.v) AS cum
  FROM grid gr LEFT JOIN counts c ON c.g = gr.g AND c.v = gr.v),
sizes AS (SELECT g, SUM(cnt) AS n FROM counts GROUP BY 1),
c AS (SELECT cdf.g, cdf.v, cdf.dv, cdf.cum, s.n FROM cdf JOIN sizes s ON s.g = cdf.g)
SELECT g_a, g_b, n_a, n_b,
       CAST(CAST(s AS DOUBLE)
            / CAST(CAST(n_a AS HUGEINT) * n_b AS DOUBLE) AS DOUBLE) AS w1
FROM (
  SELECT a.g AS g_a, b.g AS g_b,
         CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
         SUM(ABS(CAST(a.cum AS HUGEINT) * b.n
                 - CAST(b.cum AS HUGEINT) * a.n) * a.dv) AS s
  FROM c a JOIN c b ON a.v = b.v AND a.g < b.g
  GROUP BY 1, 2, 3, 4)"""


@register("w1_source_drift", _W1_ORACLE)
def w1_source_drift(spark, sf_dir):
    """Exact pairwise Wasserstein-1 distances between the per-source
    document-length distributions (190 source pairs at sf0.01);
    identical-IEEE vs the SQL CDF replay."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return w1_pairs(docs, group="source", value="n_chars")
