"""Driver-visible oracle query for the Z-order (Morton) data layout.

``plans/partitioning.py:zorder_key`` is the production layout primitive —
tile writes cluster by Morton code so parquet row-group min/max stats are
tight on BOTH axes (pinned against real footer stats in
``tests/test_zorder.py``).  This module gives that primitive a
driver-visible ORACLE query: customer-derived points are binned to a
64x64 integer grid with pure integer arithmetic (no float bin edges, so
Spark and DuckDB agree bit-for-bit), interleaved with the SAME 28-term
shift/mask expression the write path uses, and split into contiguous
z-regions of 64 codes each.

The per-region aggregate is the layout's locality CONTRACT stated as
data: a contiguous aligned run of 64 Morton codes is exactly an 8x8
spatial block, so every region's x/y extent must be <= 8 cells and its
``z_span`` < 64.  A broken interleave (swapped bit lanes, off-by-one
shift) scatters the region bbox across the grid and the hash check
fails.  At 10^12 rows the same expression is the cluster key of
``zorder_partition`` — one repartition + sortWithinPartitions, stats
verified here at query scale and in test_zorder.py at the file level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.partitioning import with_hilbert, zorder_key
from ..sources.tables import load_table
from .registry import register

GRID_BITS = 6  # 64x64 cell grid
REGION_SHIFT = 6  # 2**6 = 64 Morton codes per region -> exact 8x8 blocks


def grid_points(cust: DataFrame) -> DataFrame:
    """(point_id, gx, gy) on the 64x64 grid, pure integer arithmetic.

    Multiplicative hashing with primes coprime to 64 spreads ANY key
    range (sf0.001's 150 keys as well as sf1's millions) across the full
    grid; float bin edges are avoided entirely so Spark and DuckDB agree
    bit-for-bit.
    """
    return cust.select(
        F.col("c_custkey").alias("point_id"),
        F.expr("(c_custkey * 7919) % 64").alias("gx"),
        F.expr("(c_custkey * 104729) % 64").alias("gy"),
    )


def zorder_region_stats(points: DataFrame) -> DataFrame:
    """Per-z-region locality stats: count, bbox, Morton span.

    One shuffle (the groupBy); the Morton code itself is whole-stage
    codegen (28 shift/mask terms, no UDF).
    """
    z = zorder_key("gx", "gy", bits=GRID_BITS)
    return (
        points.withColumn("z", z)
        .groupBy(F.shiftright("z", REGION_SHIFT).alias("region"))
        .agg(
            F.count("*").alias("n_points"),
            F.min("gx").alias("min_gx"),
            F.max("gx").alias("max_gx"),
            F.min("gy").alias("min_gy"),
            F.max("gy").alias("max_gy"),
            (F.max("z") - F.min("z")).alias("z_span"),
        )
    )


def _morton_sql(x: str, y: str, bits: int) -> str:
    terms = []
    for b in range(bits):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


_Z = _morton_sql("gx", "gy", GRID_BITS)

_ZORDER_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS point_id,
         (c_custkey * 7919) % 64 AS gx,
         (c_custkey * 104729) % 64 AS gy
  FROM customer
), zc AS (
  SELECT point_id, gx, gy, {_Z} AS z FROM pts
)
SELECT z >> {REGION_SHIFT} AS region,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(gx) AS min_gx, MAX(gx) AS max_gx,
       MIN(gy) AS min_gy, MAX(gy) AS max_gy,
       MAX(z) - MIN(z) AS z_span
FROM zc GROUP BY 1"""


@register("zorder_regions", _ZORDER_ORACLE)
def zorder_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-layout locality stats per contiguous z-region (the
    write-clustering contract of ``zorder_partition``, hash-checked
    against a SQL replay of the full interleave)."""
    cust = load_table(spark, sf_dir, "customer")
    return zorder_region_stats(grid_points(cust))


# ---------------------------------------------------------------------------
# Hilbert-curve layout (the locality upgrade over Morton)
# ---------------------------------------------------------------------------


def hilbert_region_stats(points: DataFrame) -> DataFrame:
    """Per-Hilbert-region locality stats — same schema/contract as the
    Morton version, computed over ``plans.partitioning.hilbert_key``."""
    return (
        with_hilbert(points, "gx", "gy", bits=GRID_BITS, out="h")
        .groupBy(F.shiftright("h", REGION_SHIFT).alias("region"))
        .agg(
            F.count("*").alias("n_points"),
            F.min("gx").alias("min_gx"),
            F.max("gx").alias("max_gx"),
            F.min("gy").alias("min_gy"),
            F.max("gy").alias("max_gy"),
            (F.max("h") - F.min("h")).alias("h_span"),
        )
    )


def _hilbert_sql_ctes(bits: int) -> str:
    """Chained CTEs l{bits}..l0 unrolling the per-level rotate/reflect
    recurrence — the exact SQL mirror of ``hilbert_key``."""
    ctes = [
        f"l{bits} AS (SELECT point_id, gx AS x, gy AS y, CAST(0 AS BIGINT) AS d FROM pts)"
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END)"
        ctes.append(
            f"""l{i} AS (
  SELECT point_id,
         CASE WHEN {ry} = 1 THEN x
              WHEN {rx} = 1 THEN {s - 1} - y ELSE y END AS x,
         CASE WHEN {ry} = 1 THEN y
              WHEN {rx} = 1 THEN {s - 1} - x ELSE x END AS y,
         d + {s * s} * xor(3 * {rx}, {ry}) AS d
  FROM l{i + 1})"""
        )
    return ",\n".join(ctes)


_HILBERT_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS point_id,
         (c_custkey * 7919) % 64 AS gx,
         (c_custkey * 104729) % 64 AS gy
  FROM customer
),
{_hilbert_sql_ctes(GRID_BITS)},
hc AS (
  SELECT p.point_id, p.gx, p.gy, l0.d AS h
  FROM pts p JOIN l0 ON p.point_id = l0.point_id
)
SELECT h >> {REGION_SHIFT} AS region,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       MIN(gx) AS min_gx, MAX(gx) AS max_gx,
       MIN(gy) AS min_gy, MAX(gy) AS max_gy,
       MAX(h) - MIN(h) AS h_span
FROM hc GROUP BY 1"""


@register("hilbert_regions", _HILBERT_ORACLE)
def hilbert_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-layout locality stats per contiguous code region,
    hash-checked against the SQL unroll of the rotate/reflect
    recurrence (curve properties pinned in tests/test_hilbert.py)."""
    cust = load_table(spark, sf_dir, "customer")
    return hilbert_region_stats(grid_points(cust))
