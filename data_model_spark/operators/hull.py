"""Distributed planar convex hull (strict vertices, integer-exact).

Reference parity: the reference computes per-store bounding boxes only
(``conversion/geozarr.py`` STAC bbox path — covered by ``bbox_agg`` /
``store_root_bbox``); the convex hull is the natural sharpening of a
bbox footprint for irregular acquisition masks, and a classic
divide-and-conquer operator the engine adds.

Algorithm (the textbook distributed hull):

1. **Partition-local hull** — each input partition runs Andrew's
   monotone chain (O(n log n)) and emits only its local hull vertices:
   a map-side reduction from n rows to O(P * h) candidates, no shuffle.
2. **Final hull** — the candidates (a few hundred rows at ANY input
   scale: P partitions x h hull points each) shuffle to ONE task which
   re-runs the same chain.  Correctness: a global hull vertex is extreme
   within its own partition, so it survives stage 1.

Determinism contract: coordinates are **integers** (the fixture derives
them from keys; real users pass scaled-integer microdegrees), so every
orientation test is exact int64 arithmetic — no float epsilon, and the
result is bit-identical at any parallelism.  "Strict" vertices: points
interior to a hull edge are NOT vertices (the chain pops on
``cross <= 0``), matching the oracle's closed-triangle/segment cover
test.  |coords| must stay < 2^31 so cross products fit in int64.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register


def _chain(pdf: pd.DataFrame) -> pd.DataFrame:
    """Monotone chain over one pandas frame; strict (no collinear) turns."""
    if len(pdf) <= 2:
        return pdf
    pts = pdf.sort_values(["x", "y"]).to_numpy()  # columns: point_id, x, y
    x, y = pts[:, 1].astype(np.int64), pts[:, 2].astype(np.int64)

    def half(order):
        out: list[int] = []
        for i in order:
            while len(out) >= 2:
                a, b = out[-2], out[-1]
                cross = (x[b] - x[a]) * (y[i] - y[a]) - (y[b] - y[a]) * (
                    x[i] - x[a]
                )
                if cross <= 0:  # clockwise or collinear: b is not strict
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    n = len(pts)
    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    keep = sorted(set(lower[:-1] + upper[:-1]) or {0})
    return pdf.sort_values(["x", "y"]).iloc[keep]


def convex_hull(points: DataFrame, id_col: str = "point_id") -> DataFrame:
    """Strict convex-hull vertices of ``points`` (columns id, x, y int)."""
    src = points.select(F.col(id_col).alias("point_id"), "x", "y")
    schema = "point_id long, x long, y long"

    def local(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            if len(pdf):
                yield _chain(pdf)

    candidates = src.mapInPandas(local, schema)
    return (
        candidates.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: _chain(pdf.drop(columns=["g"])), schema)
    )


# ---------------------------------------------------------------------------
# registered query: integer lattice points from customer keys
# ---------------------------------------------------------------------------

# 37 and 91 are invertible mod 1999/1997, so x (and y) are injective for
# k <= 80 — no duplicate coordinates, every point distinct.
_PTS = """(SELECT c_custkey AS point_id,
                  (c_custkey * 37) % 1999 AS x,
                  (c_custkey * 91) % 1997 AS y
           FROM customer WHERE c_custkey <= 80)"""

_CROSS = (
    "(({b}.x - {a}.x) * ({c}.y - {a}.y) - ({b}.y - {a}.y) * ({c}.x - {a}.x))"
)

_HULL_ORACLE = f"""
WITH pts AS {_PTS}
SELECT p.point_id, p.x, p.y FROM pts p
WHERE NOT EXISTS (
    -- covered by a nondegenerate closed triangle of three other points
    SELECT 1 FROM pts a, pts b, pts c
    WHERE a.point_id < b.point_id AND b.point_id < c.point_id
      AND a.point_id <> p.point_id AND b.point_id <> p.point_id
      AND c.point_id <> p.point_id
      AND {_CROSS.format(a="a", b="b", c="c")} <> 0
      AND ((    {_CROSS.format(a="a", b="b", c="p")} >= 0
            AND {_CROSS.format(a="b", b="c", c="p")} >= 0
            AND {_CROSS.format(a="c", b="a", c="p")} >= 0)
        OR (    {_CROSS.format(a="a", b="b", c="p")} <= 0
            AND {_CROSS.format(a="b", b="c", c="p")} <= 0
            AND {_CROSS.format(a="c", b="a", c="p")} <= 0)))
  AND NOT EXISTS (
    -- or interior to a closed segment between two other points
    SELECT 1 FROM pts a, pts b
    WHERE a.point_id < b.point_id
      AND a.point_id <> p.point_id AND b.point_id <> p.point_id
      AND {_CROSS.format(a="a", b="b", c="p")} = 0
      AND (p.x - a.x) * (p.x - b.x) + (p.y - a.y) * (p.y - b.y) <= 0)"""


def _lattice_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 80)
    return cust.select(
        F.col("c_custkey").alias("point_id"),
        F.pmod(F.col("c_custkey") * 37, F.lit(1999)).cast("long").alias("x"),
        F.pmod(F.col("c_custkey") * 91, F.lit(1997)).cast("long").alias("y"),
    )


@register("convex_hull_vertices", _HULL_ORACLE)
def convex_hull_vertices(spark, sf_dir):
    """Strict hull vertices of 80 injective lattice points; the oracle is
    the O(n^4) closed-triangle/segment cover test — it checks the
    partition-local + final-merge chain against the geometric definition,
    not against another chain implementation."""
    return convex_hull(_lattice_points(spark, sf_dir))
