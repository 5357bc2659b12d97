"""Registered spatial queries over the driver's scalar tables.

Deterministic synthetic geometry derived from table keys (no external
data): customers become points on a lon/lat grid, suppliers become query
points, rectangles/polygons come from fixed literals.  Axis-aligned
variants are SQL-oracle-checked (PIP on rectangles == BETWEEN range join);
general polygon / cell-index variants are rows-only and validated against
NumPy oracles in pytest.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ..sources.tables import load_table, local_df
from .registry import register
from . import spatial

def _points(spark, sf_dir, table="customer", key_col="c_custkey"):
    # deterministic point derivation: key -> lon/lat in a 2x2-deg box near 10E/46N
    t = load_table(spark, sf_dir, table).select(F.col(key_col).alias("key"))
    lon = (F.lit(10.0) + (F.pmod(F.col("key") * 37, F.lit(2000)) / 1000.0)).alias("lon")
    lat = (F.lit(46.0) + (F.pmod(F.col("key") * 91, F.lit(2000)) / 1000.0)).alias("lat")
    return t.select(F.col("key").alias("point_id"), lon, lat)


_PIP_RECT_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
rects AS (
  SELECT * FROM (VALUES
    ('r0', 10.2, 46.2, 10.8, 46.8),
    ('r1', 10.5, 46.0, 11.5, 46.5),
    ('r2', 11.0, 47.0, 12.0, 48.0)
  ) AS t(rect_id, xmin, ymin, xmax, ymax))
SELECT r.rect_id, CAST(COUNT(p.point_id) AS BIGINT) AS n_points
FROM rects r LEFT JOIN pts p
  ON p.lon >= r.xmin AND p.lon < r.xmax AND p.lat >= r.ymin AND p.lat < r.ymax
GROUP BY r.rect_id
"""

RECTS = {
    "r0": (10.2, 46.2, 10.8, 46.8),
    "r1": (10.5, 46.0, 11.5, 46.5),
    "r2": (11.0, 47.0, 12.0, 48.0),
}


def _rect_ring(xmin, ymin, xmax, ymax) -> np.ndarray:
    return np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])


@register("pip_rect_join", _PIP_RECT_ORACLE)
def pip_rect_join(spark, sf_dir):
    """PIP on axis-aligned rects == range join; counts per rect (with zeros).

    The Spark side runs the *real* polygon engine (broadcast ray-casting
    PIP); the oracle reduces to BETWEEN predicates — exactness of the
    ray-casting half-open edge rule is what makes these agree.
    """
    pts = _points(spark, sf_dir)
    polys = {rid: _rect_ring(*bounds) for rid, bounds in RECTS.items()}
    assigned = spatial.pip_join_broadcast(pts, polys)
    rect_ids = local_df(spark, [(r,) for r in RECTS], "rect_id string")
    counts = assigned.groupBy(F.col("poly_id").alias("rect_id")).agg(
        F.count("*").alias("n_points")
    )
    return (
        rect_ids.join(counts, "rect_id", "left")
        .select("rect_id", F.coalesce("n_points", F.lit(0)).alias("n_points"))
    )


@register("pip_cell_join", None)  # general polygons: NumPy-oracle in pytest
def pip_cell_join(spark, sf_dir):
    """Cell-partitioned PIP join (triangle + concave polygon), salted."""
    pts = _points(spark, sf_dir)
    polys = {
        "tri": np.array([[10.1, 46.1], [11.5, 46.2], [10.3, 47.6]]),
        "ell": np.array(
            [[10.0, 46.0], [11.0, 46.0], [11.0, 46.4], [10.4, 46.4], [10.4, 47.4], [10.0, 47.4]]
        ),
    }
    pdf = spatial.polygons_df(spark, polys)
    return spatial.pip_join_cells(pts, pdf, res=9, salt=4).select(
        "point_id", "poly_id"
    )


_KNN_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
qs AS (
  SELECT s_suppkey AS query_id,
         10.0 + (s_suppkey * 37 % 2000) / 1000.0 AS q_lon,
         46.0 + (s_suppkey * 91 % 2000) / 1000.0 AS q_lat
  FROM supplier WHERE s_suppkey < 4),
scored AS (
  SELECT q.query_id, p.point_id,
         ROUND(2 * 6371008.8 * asin(sqrt(
           least(1.0, pow(sin(radians(p.lat - q.q_lat) / 2), 2)
             + cos(radians(q.q_lat)) * cos(radians(p.lat))
             * pow(sin(radians(p.lon - q.q_lon) / 2), 2)))), 3) AS dist_m
  FROM pts p CROSS JOIN qs q),
ranked AS (
  SELECT query_id, point_id, dist_m,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist_m, point_id) AS rank
  FROM scored)
SELECT query_id, point_id, dist_m, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


@register("knn_bruteforce", _KNN_ORACLE)
def knn_bruteforce(spark, sf_dir):
    """Exact kNN (haversine top-5) — the refinement-correctness oracle."""
    pts = _points(spark, sf_dir)
    qs = _points(spark, sf_dir, "supplier", "s_suppkey").filter(
        F.col("point_id") < 4
    ).withColumnRenamed("point_id", "query_id")
    return spatial.knn_bruteforce(pts, qs, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


@register("knn_cells", None)  # ring-size dependent: brute-force twin in pytest
def knn_cells(spark, sf_dir):
    """kNN via cell k-ring expansion + exact refinement (the scale path)."""
    pts = _points(spark, sf_dir)
    qs = _points(spark, sf_dir, "supplier", "s_suppkey").filter(
        F.col("point_id") < 4
    ).withColumnRenamed("point_id", "query_id")
    return spatial.knn_join(pts, qs, k=5, res=7, ring=2)


@register("cell_cover_counts", None)  # engine-native cell index: rows-only
def cell_cover_counts(spark, sf_dir):
    """Histogram of points per cell at res 9 — partition-key balance probe."""
    pts = _points(spark, sf_dir)
    keyed = spatial.with_point_cell(pts, res=9)
    return keyed.groupBy("cell").agg(F.count("*").alias("n")).orderBy(
        F.col("n").desc(), "cell"
    )
