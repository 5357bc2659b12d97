"""Exact polygon metrics: shoelace area + centroid over vector layers.

The `ST_Area` / `ST_Centroid` slot of the vector suite — computed
EXACTLY by quantizing every vertex to integer tenth-millidegrees
(``floor(x * 10000 + 0.5)``, one deterministic double op per
coordinate) and running the shoelace sums in pure int64:

    2A  = sum (x_i * y_{i+1} - x_{i+1} * y_i)          (signed)
    6A*Cx = sum (x_i + x_{i+1}) (x_i y_{i+1} - x_{i+1} y_i)

Both are exact integers; the centroid is then ONE correctly-rounded
double division per axis, identical in Spark and DuckDB.  Ring
orientation is normalized by taking |2A| and dividing the centroid
numerators by the SIGNED 2A (the standard formula is orientation-safe).

Scale shape: vertices explode to (poly_id, idx) rows, the cyclic
successor comes from ONE lag-style self-join on ``(poly_id,
(idx+1) % n)`` (no window needed — the ring length is carried), and the
sums are one combinable aggregation on poly_id — three narrow ops at any
polygon count.  Inputs: the two vector layers the overlay suite already
queries (literal zones + supplier-derived footprint rects).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

Q = 10_000  # tenth-millidegree lattice


def _quant(v: float) -> int:
    return int(np.floor(v * Q + 0.5))


def polygon_metrics(verts: DataFrame) -> DataFrame:
    """(poly_id, n_vertices, area2, cx, cy) from (poly_id, idx, qx, qy).

    ``idx`` 0-based ring order, ``qx/qy`` integer lattice coordinates;
    ``area2`` = |2A| on the lattice (exact int64), centroid in degrees.
    """
    n = verts.groupBy("poly_id").agg(F.count("*").alias("n"))
    v = verts.join(n, "poly_id")
    succ = v.select(
        "poly_id",
        F.pmod(F.col("idx") + 1, F.col("n")).alias("idx"),
        F.col("qx").alias("nx"),
        F.col("qy").alias("ny"),
    )
    # cyclic successor join: rotating the index by -1 pairs each vertex
    # with the next one around the ring
    edges = v.join(succ, ["poly_id", "idx"]).withColumn(
        "cross", F.col("qx") * F.col("ny") - F.col("nx") * F.col("qy")
    )
    agg = edges.groupBy("poly_id").agg(
        F.count("*").alias("n_vertices"),
        F.sum("cross").alias("a2"),
        F.sum((F.col("qx") + F.col("nx")) * F.col("cross")).alias("sx"),
        F.sum((F.col("qy") + F.col("ny")) * F.col("cross")).alias("sy"),
    )
    return agg.select(
        "poly_id",
        F.col("n_vertices").cast("long").alias("n_vertices"),
        F.abs("a2").alias("area2"),
        F.round(F.col("sx") / (F.col("a2") * 3.0) / Q, 6).alias("cx"),
        F.round(F.col("sy") / (F.col("a2") * 3.0) / Q, 6).alias("cy"),
    )


def _zone_vertices() -> list[tuple[str, int, int, int]]:
    from .spatial_queries import _OVERLAY_POLYS

    rows = []
    for pid, ring in sorted(_OVERLAY_POLYS.items()):
        for i, (x, y) in enumerate(ring):
            rows.append((pid, i, _quant(float(x)), _quant(float(y))))
    return rows


def _rect_vertices(sup: DataFrame) -> DataFrame:
    """Supplier footprint rect rings (the polygon_overlay fixture), with
    the rect corners quantized through the identical floor expression."""
    k = F.col("s_suppkey")
    xmin = F.lit(10.0) + F.pmod(k * 53, F.lit(1900)) / F.lit(1000.0)
    ymin = F.lit(46.0) + F.pmod(k * 29, F.lit(1900)) / F.lit(1000.0)
    xmax = xmin + (F.lit(0.05) + F.pmod(k, F.lit(7)) * F.lit(0.03))
    ymax = ymin + (F.lit(0.05) + F.pmod(k, F.lit(5)) * F.lit(0.04))
    qq = lambda c: F.floor(c * Q + F.lit(0.5)).cast("long")  # noqa: E731
    corners = F.array(
        F.struct(qq(xmin).alias("qx"), qq(ymin).alias("qy")),
        F.struct(qq(xmax).alias("qx"), qq(ymin).alias("qy")),
        F.struct(qq(xmax).alias("qx"), qq(ymax).alias("qy")),
        F.struct(qq(xmin).alias("qx"), qq(ymax).alias("qy")),
    )
    return sup.select(
        F.concat(F.lit("s"), k.cast("string")).alias("poly_id"),
        F.posexplode(corners).alias("idx", "v"),
    ).select("poly_id", "idx", "v.qx", "v.qy")


def _oracle() -> str:
    zone_vals = ", ".join(
        f"('{p}', {i}, {qx}, {qy})" for p, i, qx, qy in _zone_vertices()
    )
    return f"""
WITH rect AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS poly_id,
         CAST(FLOOR((10.0 + (s_suppkey * 53) % 1900 / 1000.0) * {Q} + 0.5) AS BIGINT) AS x0,
         CAST(FLOOR((46.0 + (s_suppkey * 29) % 1900 / 1000.0) * {Q} + 0.5) AS BIGINT) AS y0,
         -- parenthesized exactly as the Spark side associates: xmin +
         -- (0.05 + m*0.03) — float addition is not associative, and a
         -- different grouping can flip FLOOR at a lattice boundary
         CAST(FLOOR(((10.0 + (s_suppkey * 53) % 1900 / 1000.0)
                     + (0.05 + (s_suppkey % 7) * 0.03)) * {Q} + 0.5) AS BIGINT) AS x1,
         CAST(FLOOR(((46.0 + (s_suppkey * 29) % 1900 / 1000.0)
                     + (0.05 + (s_suppkey % 5) * 0.04)) * {Q} + 0.5) AS BIGINT) AS y1
  FROM supplier
), verts AS (
  SELECT poly_id, idx, qx, qy FROM (VALUES {zone_vals}) t(poly_id, idx, qx, qy)
  UNION ALL SELECT poly_id, 0, x0, y0 FROM rect
  UNION ALL SELECT poly_id, 1, x1, y0 FROM rect
  UNION ALL SELECT poly_id, 2, x1, y1 FROM rect
  UNION ALL SELECT poly_id, 3, x0, y1 FROM rect
), n AS (SELECT poly_id, COUNT(*) AS n FROM verts GROUP BY 1),
edges AS (
  SELECT v.poly_id,
         v.qx * s.qy - s.qx * v.qy AS cr,
         v.qx + s.qx AS xs, v.qy + s.qy AS ys
  FROM verts v
  JOIN n USING (poly_id)
  JOIN verts s ON s.poly_id = v.poly_id AND s.idx = (v.idx + 1) % n.n
), agg AS (
  SELECT poly_id, CAST(COUNT(*) AS BIGINT) AS n_vertices,
         CAST(SUM(cr) AS BIGINT) AS a2,
         CAST(SUM(xs * cr) AS BIGINT) AS sx,
         CAST(SUM(ys * cr) AS BIGINT) AS sy
  FROM edges GROUP BY 1)
SELECT poly_id, n_vertices, ABS(a2) AS area2,
       ROUND(sx / (a2 * 3.0) / {Q}, 6) AS cx,
       ROUND(sy / (a2 * 3.0) / {Q}, 6) AS cy
FROM agg"""


@register("polygon_metrics", _oracle)
def polygon_metrics_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shoelace area + centroid for the overlay suite's two vector
    layers (literal zones + supplier footprint rects)."""
    from ..sources.tables import local_df

    spark_zones = local_df(
        spark, _zone_vertices(), "poly_id string, idx long, qx long, qy long"
    )
    rects = _rect_vertices(load_table(spark, sf_dir, "supplier"))
    verts = spark_zones.unionByName(
        rects.select(
            "poly_id", F.col("idx").cast("long"), F.col("qx"), F.col("qy")
        )
    )
    return polygon_metrics(verts)
