"""Area-weighted areal interpolation (the census-redistribution operator).

Transfers an extensive variable (population, parcel counts, emissions)
from source zones to an incompatible target zoning: each target receives
``sum_s val_s * area(s ∩ t) / area(s)`` — the standard GIS areal-weighting
estimator (Goodchild & Lam 1980).  The reference's spatial layer stops at
bbox queries and zonal stats; this is the polygon-overlay transfer a
geospatial warehouse needs for any "reproject statistics onto my grid"
request.

Spark-first shape (the ``pip_cell_join`` recipe): NO cartesian product —
both zonings are bucketed onto a coarse integer cell grid (``F.sequence``
explode over each rectangle's covering cells), candidates meet in one
equi-join on the cell key, pair duplicates from multi-cell rectangles are
removed by a DISTINCT on the pair key, and the exact intersection test +
area runs as JVM column arithmetic.  At 10^8 zones per side the join is
bounded by true spatial density per cell, exactly like the engine's
point-in-polygon and kNN joins; a skewed mega-zone salts the same way
``pip_join_cells(salt=k)`` does.

Exactness: zones are integer-meter rectangles, so the intersection area
is an exact int64 and the only division — by the source area — is the
truncating integer division both engines define identically for positive
operands (`DIV` in Spark, `//` in DuckDB), applied to the 1e6-scaled
contribution ``val * inter_area * 1_000_000 DIV src_area``.  Bound:
val <= 97, inter <= src_area <= 630_000, so a single contribution is
< 6.2e13 and per-target sums stay far inside int64.

Fixture derivation (no external data): source rectangles from supplier
keys by pure index arithmetic, target zoning = the 25-cell 1 km grid
derived from nation keys.  Targets are grid-aligned to exactly one
bucket cell, which makes the bucket join provably lossless here: any
source overlapping a target covers that target's cell.

Oracle: the full pipeline re-expressed in DuckDB SQL over the same
parquet tables (generate_series bucketing + DISTINCT + integer math) —
a generative twin that scales with sf_dir, not a VALUES replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

PITCH_M = 1000  # bucket-cell pitch; also the target grid pitch
W_SCALE = 1_000_000  # fixed-point scale of the areal weight


def source_rects(supplier: DataFrame) -> DataFrame:
    """Deterministic integer-meter rectangles + value from supplier keys."""
    return supplier.selectExpr(
        "concat('s_', s_suppkey) AS src_id",
        "(s_suppkey * 53 % 40) * 100 AS sx0",
        "(s_suppkey * 29 % 40) * 100 AS sy0",
        "(s_suppkey * 53 % 40) * 100 + 300 + (s_suppkey % 5) * 100 AS sx1",
        "(s_suppkey * 29 % 40) * 100 + 300 + (s_suppkey % 7) * 100 AS sy1",
        "s_suppkey % 97 + 1 AS val",
    )


def target_grid(nation: DataFrame) -> DataFrame:
    """25-zone 1 km target zoning from nation keys (5 x 5 grid)."""
    return nation.selectExpr(
        "concat('t_', n_nationkey) AS tgt_id",
        f"(n_nationkey % 5) * {PITCH_M} AS tx0",
        f"(n_nationkey DIV 5) * {PITCH_M} AS ty0",
        f"(n_nationkey % 5) * {PITCH_M} + {PITCH_M} AS tx1",
        f"(n_nationkey DIV 5) * {PITCH_M} + {PITCH_M} AS ty1",
    )


def areal_interpolate(src: DataFrame, tgt: DataFrame) -> DataFrame:
    """(tgt_id, n_src, est_scaled): cell-bucketed overlay, exact weights.

    ``est_scaled`` is the areal-weighted estimate scaled by ``W_SCALE``
    (exact int64); divide by 1e6 for the real-valued estimate.
    """
    sc = (
        src.withColumn(
            "cx", F.explode(F.expr(f"sequence(sx0 DIV {PITCH_M}, (sx1 - 1) DIV {PITCH_M})"))
        )
        .withColumn(
            "cy", F.explode(F.expr(f"sequence(sy0 DIV {PITCH_M}, (sy1 - 1) DIV {PITCH_M})"))
        )
    )
    tc = tgt.withColumn("cx", F.expr(f"tx0 DIV {PITCH_M}")).withColumn(
        "cy", F.expr(f"ty0 DIV {PITCH_M}")
    )
    pairs = (
        sc.join(tc, ["cx", "cy"])
        .select(
            "src_id", "tgt_id", "sx0", "sy0", "sx1", "sy1", "val",
            "tx0", "ty0", "tx1", "ty1",
        )
        .distinct()
    )
    inter = pairs.where(
        "least(sx1, tx1) > greatest(sx0, tx0) AND least(sy1, ty1) > greatest(sy0, ty0)"
    ).selectExpr(
        "tgt_id",
        "src_id",
        "val * ((least(sx1, tx1) - greatest(sx0, tx0))"
        " * (least(sy1, ty1) - greatest(sy0, ty0)))"
        f" * {W_SCALE} DIV ((sx1 - sx0) * (sy1 - sy0)) AS contrib",
    )
    agg = inter.groupBy("tgt_id").agg(
        F.count("src_id").alias("n_src"),
        F.sum("contrib").alias("est_scaled"),
    )
    return tgt.select("tgt_id").join(agg, "tgt_id", "left").select(
        "tgt_id",
        F.coalesce("n_src", F.lit(0)).cast("long").alias("n_src"),
        F.coalesce("est_scaled", F.lit(0)).cast("long").alias("est_scaled"),
    )


_AREAL_ORACLE = f"""
WITH src AS (
  SELECT 's_' || s_suppkey AS src_id,
         (s_suppkey * 53 % 40) * 100 AS sx0,
         (s_suppkey * 29 % 40) * 100 AS sy0,
         (s_suppkey * 53 % 40) * 100 + 300 + (s_suppkey % 5) * 100 AS sx1,
         (s_suppkey * 29 % 40) * 100 + 300 + (s_suppkey % 7) * 100 AS sy1,
         s_suppkey % 97 + 1 AS val
  FROM supplier),
tgt AS (
  SELECT 't_' || n_nationkey AS tgt_id,
         (n_nationkey % 5) * {PITCH_M} AS tx0,
         (n_nationkey // 5) * {PITCH_M} AS ty0,
         (n_nationkey % 5) * {PITCH_M} + {PITCH_M} AS tx1,
         (n_nationkey // 5) * {PITCH_M} + {PITCH_M} AS ty1
  FROM nation),
sc AS (
  -- fixture rects are < {PITCH_M} m wide, so each spans at most 2 cells
  -- per axis; the 0/1-offset join replaces a lateral generate_series
  -- (DuckDB cannot lateral-join a table function on column bounds)
  SELECT src.*, (sx0 // {PITCH_M}) + dx.k AS cx, (sy0 // {PITCH_M}) + dy.k AS cy
  FROM src, (VALUES (0), (1)) AS dx(k), (VALUES (0), (1)) AS dy(k)
  WHERE (sx0 // {PITCH_M}) + dx.k <= (sx1 - 1) // {PITCH_M}
    AND (sy0 // {PITCH_M}) + dy.k <= (sy1 - 1) // {PITCH_M}),
tc AS (SELECT tgt.*, tx0 // {PITCH_M} AS cx, ty0 // {PITCH_M} AS cy FROM tgt),
pairs AS (
  SELECT DISTINCT src_id, tgt_id, sx0, sy0, sx1, sy1, val, tx0, ty0, tx1, ty1
  FROM sc JOIN tc USING (cx, cy)),
inter AS (
  SELECT tgt_id, src_id,
         val * ((LEAST(sx1, tx1) - GREATEST(sx0, tx0))
                * (LEAST(sy1, ty1) - GREATEST(sy0, ty0)))
           * {W_SCALE} // ((sx1 - sx0) * (sy1 - sy0)) AS contrib
  FROM pairs
  WHERE LEAST(sx1, tx1) > GREATEST(sx0, tx0)
    AND LEAST(sy1, ty1) > GREATEST(sy0, ty0))
SELECT t.tgt_id AS tgt_id,
       CAST(COUNT(i.src_id) AS BIGINT) AS n_src,
       CAST(COALESCE(SUM(i.contrib), 0) AS BIGINT) AS est_scaled
FROM tgt t LEFT JOIN inter i ON t.tgt_id = i.tgt_id
GROUP BY t.tgt_id"""


@register("areal_interp", _AREAL_ORACLE)
def areal_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-weighted transfer of supplier-rect values onto the 1 km
    nation target grid — cell-bucketed overlay join, exact int64 math."""
    return areal_interpolate(
        source_rects(load_table(spark, sf_dir, "supplier")),
        target_grid(load_table(spark, sf_dir, "nation")),
    )
