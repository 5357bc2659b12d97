"""S2 structure consolidation as table regrouping (SURVEY §2 J5 on engine data).

The reference's ``S2DataConsolidator``
(`s2_optimization/s2_data_consolidator.py:10-217`) walks a scattered
DataTree and regroups variables into per-resolution consolidated datasets:
reflectance bands stay named, quality masks become ``quality_{band}``,
detector footprints ``detector_footprint_{band}``, atmosphere (aot/wvp),
classification (scl) and probability (cld/snw) fold into the 20 m group,
geometry collapses to one group, meteorology gets ``cams_``/``ecmwf_``
prefixes (`create_consolidated_dataset` then unions them into one dataset
per resolution).

Spark-first: variables are LONG rows ``(group_path, var, resolution, y, x,
value)``; consolidation is a pure JVM expression pipeline —

* classify + rename from ``group_path`` (``when`` chain, no UDF),
* regroup = the classification columns becoming the grouping keys,
* the per-resolution "consolidated dataset" = ``groupBy(res, y, x)
  .pivot(out_var)`` — the unionByName(allowMissingColumns)+pivot shape —
  one shuffle per resolution, narrow before it.

At scale the long table is partitioned by (resolution, y-range); the pivot
var list is tiny metadata (broadcast), so consolidation is a single hash
aggregation per resolution regardless of scene count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fixture_range, local_df
from .registry import register

# (group_path, var, resolution_m, vk) — vk seeds the deterministic value
# formula so the DuckDB oracle regenerates identical data
VAR_SPECS = [
    ("/measurements/reflectance/r10m", "b02", 10, 1),
    ("/measurements/reflectance/r10m", "b03", 10, 2),
    ("/measurements/reflectance/r10m", "b04", 10, 3),
    ("/measurements/reflectance/r20m", "b05", 20, 4),
    ("/measurements/reflectance/r60m", "b01", 60, 5),
    ("/quality/mask/r10m", "b02", 10, 6),
    ("/conditions/mask/detector_footprint/r10m", "b02", 10, 7),
    ("/quality/atmosphere/r20m", "aot", 20, 8),
    ("/quality/atmosphere/r20m", "wvp", 20, 9),
    ("/conditions/mask/l2a_classification/r20m", "scl", 20, 10),
    ("/quality/probability/r20m", "cld", 20, 11),
    ("/quality/probability/r20m", "snw", 20, 12),
    ("/conditions/geometry", "sun_zenith", 20, 13),
    ("/conditions/meteorology/cams", "msl", 20, 14),
    ("/conditions/meteorology/ecmwf", "tco3", 20, 15),
]

GRID_N = {10: 12, 20: 6, 60: 2}  # deterministic mini-scene dims per res


def scene_var_tables(spark: SparkSession) -> DataFrame:
    """Distributed long-format scattered structure with formula values.

    value(vk, y, x) = (y*7 + x*13 + vk*31) % 997 — recomputable in DuckDB.
    """
    parts = []
    for res, n in GRID_N.items():
        specs = local_df(
            spark,
            [s for s in VAR_SPECS if s[2] == res],
            "group_path string, var string, resolution int, vk int",
        )
        grid = fixture_range(spark, n * n).select(
            (F.col("id") / n).cast("int").alias("y"),
            F.pmod(F.col("id"), F.lit(n)).cast("int").alias("x"),
        )
        parts.append(grid.crossJoin(F.broadcast(specs)))
    df = reduce(lambda a, b: a.unionByName(b), parts)
    return df.withColumn(
        "value",
        F.pmod(
            F.col("y") * 7 + F.col("x") * 13 + F.col("vk") * 31, F.lit(997)
        ).cast("double"),
    ).drop("vk")


def consolidate(vars_df: DataFrame) -> DataFrame:
    """Classify + rename + regroup: the consolidated LONG table.

    Output: (target, resolution, category, out_var, y, x, value) where
    ``target`` is measurements/geometry/meteorology (the reference's three
    output dictionaries).
    """
    gp = F.col("group_path")
    category = (
        F.when(gp.startswith("/measurements/reflectance"), "bands")
        .when(gp.startswith("/quality/mask"), "quality")
        .when(gp.startswith("/conditions/mask/detector_footprint"), "detector_footprints")
        .when(gp.startswith("/quality/atmosphere"), "atmosphere")
        .when(gp.startswith("/conditions/mask/l2a_classification"), "classification")
        .when(gp.startswith("/quality/probability"), "probability")
        .when(gp.startswith("/conditions/geometry"), "geometry")
        .when(gp.startswith("/conditions/meteorology"), "meteorology")
        .otherwise("unknown")
    )
    target = (
        F.when(category.isin("geometry"), "geometry")
        .when(category.isin("meteorology"), "meteorology")
        .otherwise("measurements")
    )
    out_var = (
        F.when(category == "quality", F.concat(F.lit("quality_"), F.col("var")))
        .when(
            category == "detector_footprints",
            F.concat(F.lit("detector_footprint_"), F.col("var")),
        )
        .when(
            gp.startswith("/conditions/meteorology/cams"),
            F.concat(F.lit("cams_"), F.col("var")),
        )
        .when(
            gp.startswith("/conditions/meteorology/ecmwf"),
            F.concat(F.lit("ecmwf_"), F.col("var")),
        )
        .otherwise(F.col("var"))
    )
    return vars_df.select(
        target.alias("target"),
        "resolution",
        category.alias("category"),
        out_var.alias("out_var"),
        "y",
        "x",
        "value",
    )


def consolidated_dataset(cons: DataFrame, resolution: int) -> DataFrame:
    """Per-resolution wide dataset: pivot out_var into columns
    (`create_consolidated_dataset`, `s2_data_consolidator.py:182-217`)."""
    return (
        cons.filter(
            (F.col("target") == "measurements")
            & (F.col("resolution") == resolution)
        )
        .groupBy("y", "x")
        .pivot("out_var")
        .agg(F.first("value"))
        .orderBy("y", "x")
    )


_ORACLE = """
WITH specs(group_path, var, resolution, vk) AS (VALUES
  %s
), grid AS (
  SELECT s.*, gy.y, gx.x
  FROM specs s,
       LATERAL (SELECT UNNEST(range(CASE s.resolution WHEN 10 THEN 12 WHEN 20 THEN 6 ELSE 2 END)) AS y) gy,
       LATERAL (SELECT UNNEST(range(CASE s.resolution WHEN 10 THEN 12 WHEN 20 THEN 6 ELSE 2 END)) AS x) gx
), vals AS (
  SELECT *, CAST((y*7 + x*13 + vk*31) %% 997 AS DOUBLE) AS value FROM grid
), cons AS (
  SELECT
    CASE WHEN group_path LIKE '/conditions/geometry%%' THEN 'geometry'
         WHEN group_path LIKE '/conditions/meteorology%%' THEN 'meteorology'
         ELSE 'measurements' END AS target,
    resolution,
    CASE WHEN group_path LIKE '/measurements/reflectance%%' THEN 'bands'
         WHEN group_path LIKE '/quality/mask%%' THEN 'quality'
         WHEN group_path LIKE '/conditions/mask/detector_footprint%%' THEN 'detector_footprints'
         WHEN group_path LIKE '/quality/atmosphere%%' THEN 'atmosphere'
         WHEN group_path LIKE '/conditions/mask/l2a_classification%%' THEN 'classification'
         WHEN group_path LIKE '/quality/probability%%' THEN 'probability'
         WHEN group_path LIKE '/conditions/geometry%%' THEN 'geometry'
         WHEN group_path LIKE '/conditions/meteorology%%' THEN 'meteorology'
         ELSE 'unknown' END AS category,
    CASE WHEN group_path LIKE '/quality/mask%%' THEN 'quality_' || var
         WHEN group_path LIKE '/conditions/mask/detector_footprint%%' THEN 'detector_footprint_' || var
         WHEN group_path LIKE '/conditions/meteorology/cams%%' THEN 'cams_' || var
         WHEN group_path LIKE '/conditions/meteorology/ecmwf%%' THEN 'ecmwf_' || var
         ELSE var END AS out_var,
    value
  FROM vals
)
SELECT target, resolution, category, out_var,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(SUM(value), 6) AS sum_value
FROM cons
GROUP BY target, resolution, category, out_var
ORDER BY target, resolution, category, out_var
""" % ",\n  ".join(
    f"('{g}', '{v}', {r}, {k})" for g, v, r, k in VAR_SPECS
)


@register("consolidate_s2", _ORACLE)
def consolidate_s2(spark, sf_dir):
    """Consolidation summary: per (target, resolution, category, out_var)
    cell count + value checksum of the regrouped scene."""
    cons = consolidate(scene_var_tables(spark))
    return (
        cons.groupBy("target", "resolution", "category", "out_var")
        .agg(
            F.count("*").alias("n_cells"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .orderBy("target", "resolution", "category", "out_var")
    )
