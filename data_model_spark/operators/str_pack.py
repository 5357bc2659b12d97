"""Sort-Tile-Recursive (STR) R-tree bulk packing, fully relational.

A 10^12-row spatial corpus needs its per-scene box sets packed into
R-tree leaf pages before any index can be bulk-loaded; STR (Leutenegger
et al., ICDE 1997) is the standard bulk-packing recipe: sort by center
x, cut into ceil(sqrt(P)) vertical slices of S*C entries, sort each
slice by center y, cut into pages of C.  Every step is a window rank +
integer arithmetic, so the WHOLE pack is relational — two
``row_number`` windows partitioned by scene (partition size bounded by
the per-scene detector cap, never the corpus) and one grouped MBR
aggregation.  No UDFs; the oracle is the IDENTICAL pipeline in DuckDB
SQL.

Determinism: centers tie-break by box_id in both sort keys, so the page
assignment is a pure function of the box set.  ``2*center`` (= x0 + x1)
keeps the sort keys integer.

Output per page: entry count (<= capacity, pinned by pytest), the page
MBR, and the MBR semi-perimeter — the quantity STR minimizes and the
standard pack-quality metric.

Reference context: the reference aligns chunk grids by divisor search
(``conversion/utils.py:161-189``); STR packing is the same
"co-locate what will be read together" decision applied to irregular
vector geometries instead of regular rasters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .boxes import _SQL_BOXES, boxes_from_ids
from .registry import register

PAGE_CAP = 16


def str_pack(boxes: DataFrame, capacity: int = PAGE_CAP) -> DataFrame:
    """(scene, slice, page, n_entries, x0, y0, x1, y1, semi_perim)."""
    c = capacity
    w_n = Window.partitionBy("scene")
    w_x = Window.partitionBy("scene").orderBy(
        (F.col("x0") + F.col("x1")).asc(), F.col("box_id").asc()
    )
    sliced = (
        boxes.withColumn("n", F.count("*").over(w_n))
        .withColumn("rx", F.row_number().over(w_x))
        .withColumn("p", F.expr(f"(n + {c} - 1) div {c}"))
        .withColumn("s", F.expr("ceil(sqrt(cast(p as double)))").cast("long"))
        .withColumn("slice", F.expr(f"(rx - 1) div (s * {c})"))
    )
    w_y = Window.partitionBy("scene", "slice").orderBy(
        (F.col("y0") + F.col("y1")).asc(), F.col("box_id").asc()
    )
    paged = sliced.withColumn("ry", F.row_number().over(w_y)).withColumn(
        "page", F.expr(f"(ry - 1) div {c}")
    )
    return (
        paged.groupBy("scene", "slice", "page")
        .agg(
            F.count("*").alias("n_entries"),
            F.min("x0").alias("x0"),
            F.min("y0").alias("y0"),
            F.max("x1").alias("x1"),
            F.max("y1").alias("y1"),
        )
        .withColumn(
            "semi_perim",
            (F.col("x1") - F.col("x0")) + (F.col("y1") - F.col("y0")),
        )
    )


_STR_ORACLE = f"""
WITH b AS ({_SQL_BOXES}),
sl AS (SELECT *,
        COUNT(*) OVER (PARTITION BY scene) AS n,
        ROW_NUMBER() OVER (PARTITION BY scene
                           ORDER BY x0 + x1, box_id) AS rx
       FROM b),
sl2 AS (SELECT *,
         CAST(CEIL(SQRT(CAST((n + {PAGE_CAP} - 1) // {PAGE_CAP} AS DOUBLE)))
              AS BIGINT) AS s
        FROM sl),
pg AS (SELECT *,
        (rx - 1) // (s * {PAGE_CAP}) AS slice
       FROM sl2),
pg2 AS (SELECT *,
         ROW_NUMBER() OVER (PARTITION BY scene, slice
                            ORDER BY y0 + y1, box_id) AS ry
        FROM pg)
SELECT scene, slice, (ry - 1) // {PAGE_CAP} AS page,
       CAST(COUNT(*) AS BIGINT) AS n_entries,
       MIN(x0) AS x0, MIN(y0) AS y0, MAX(x1) AS x1, MAX(y1) AS y1,
       (MAX(x1) - MIN(x0)) + (MAX(y1) - MIN(y0)) AS semi_perim
FROM pg2
GROUP BY 1, 2, 3"""


@register("str_pack_pages", _STR_ORACLE)
def str_pack_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR-pack the event-derived boxes into capacity-16 R-tree leaf
    pages per scene; the oracle runs the identical two-window pipeline
    in DuckDB."""
    return str_pack(boxes_from_ids(load_table(spark, sf_dir, "events")))
