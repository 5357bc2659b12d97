"""Hypertable-style multi-resolution cell rollup (vector-point pyramid).

The raster pyramid's vector twin: per-cell point counts materialized at
EVERY resolution level, finest to coarsest, so a dashboard zoom-out
reads the pre-aggregated level instead of re-scanning points — the
"hypertable rollup" / continuous-aggregate shape.

Cascade exactness: level r-1 aggregates LEVEL r's counts (child cells
collapse 4->1 via integer halving), not the raw points — the same
partial+final pattern the tile pyramid uses (``two_phase_avg``), so
each level costs one combinable aggregation over the PREVIOUS level's
bounded table (4096 rows at the finest here), never a rescan.  The
union of levels is the rollup table a 10^12-point corpus would
checkpoint; only the level-6 pass touches the points.

The oracle unrolls the identical cascade in SQL CTEs — a hash mismatch
catches a broken halving or a level skipping the cascade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .layout import GRID_BITS, grid_points
from .registry import register


def cell_rollup_counts(points: DataFrame, bits: int = GRID_BITS) -> DataFrame:
    """(level, cx, cy, n_points) for level = bits .. 0; level ``bits`` is
    the finest (full grid), level 0 one root cell."""
    level = points.groupBy(
        F.col("gx").alias("cx"), F.col("gy").alias("cy")
    ).agg(F.count("*").alias("n_points"))
    out = level.withColumn("level", F.lit(bits))
    for lvl in range(bits - 1, -1, -1):
        level = (
            level.groupBy(
                F.expr("cx div 2").alias("cx"), F.expr("cy div 2").alias("cy")
            )
            .agg(F.sum("n_points").alias("n_points"))
        )
        out = out.unionByName(level.withColumn("level", F.lit(lvl)))
    return out.select(
        F.col("level").cast("long"), "cx", "cy", "n_points"
    )


def _oracle(bits: int = GRID_BITS) -> str:
    ctes = [
        """pts AS (
  SELECT (c_custkey * 7919) % 64 AS gx, (c_custkey * 104729) % 64 AS gy
  FROM customer)""",
        f"""l{bits} AS (
  SELECT gx AS cx, gy AS cy, CAST(COUNT(*) AS BIGINT) AS n_points
  FROM pts GROUP BY 1, 2)""",
    ]
    for lvl in range(bits - 1, -1, -1):
        ctes.append(
            f"""l{lvl} AS (
  SELECT cx // 2 AS cx, cy // 2 AS cy, CAST(SUM(n_points) AS BIGINT) AS n_points
  FROM l{lvl + 1} GROUP BY 1, 2)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({lvl} AS BIGINT) AS level, cx, cy, n_points FROM l{lvl}"
        for lvl in range(bits, -1, -1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


@register("cell_rollup_counts", _oracle())
def cell_rollup_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-level point-count rollup pyramid over the 64x64 customer grid."""
    return cell_rollup_counts(grid_points(load_table(spark, sf_dir, "customer")))
