"""Origin-destination flow matrix from trajectory streams.

The mobility-analytics staple: aggregate per-fix transitions into
cell-to-cell flow counts (who moves from where to where), the input of
flow maps, demand models, and transport assignment.  One LEAD window per
track (the same per-user ordered partition the trajectory suite already
shuffles on) derives consecutive-fix pairs; cells come from
power-of-two-pitch floor binning — ``FLOOR(x / 32.0)`` is EXACT for
these integer coordinates (division by a power of two is lossless in
binary, and floor handles the negative half-plane identically in Spark
and DuckDB, where integer ``div``/``//`` semantics would diverge).
Self-loops (fix pairs inside one cell) are excluded: flows measure
movement.

Scale: one window shuffle on the track key + one combinable count
aggregation on the (origin, destination) key — both standard bounded
shapes at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .registry import register
from .trajectory import _traj_fixture

CELL = 32


def _cell(col: str):
    return F.floor(F.col(col) / float(CELL)).cast("long")


def od_flows(tracks: DataFrame) -> DataFrame:
    """(o_cx, o_cy, d_cx, d_cy, flow) over consecutive-fix transitions."""
    w = Window.partitionBy("user_id").orderBy("seq")
    stepped = tracks.select(
        "user_id",
        "seq",
        _cell("x").alias("o_cx"),
        _cell("y").alias("o_cy"),
        F.lead(_cell("x")).over(w).alias("d_cx"),
        F.lead(_cell("y")).over(w).alias("d_cy"),
    ).filter(
        F.col("d_cx").isNotNull()
        & ((F.col("o_cx") != F.col("d_cx")) | (F.col("o_cy") != F.col("d_cy")))
    )
    return stepped.groupBy("o_cx", "o_cy", "d_cx", "d_cy").agg(
        F.count("*").alias("flow")
    )


# fixture replay in SQL: the identical spark.range walk recurrence
_OD_ORACLE = f"""
WITH ids AS (
  SELECT i AS id FROM generate_series(0, {12 * 120 - 1}) AS t(i)
), fixes AS (
  SELECT id // 120 AS user_id, id % 120 + 1 AS seq,
         ((id * 37) % 21 - 10)
           * (CASE WHEN ((id % 120) // 20) % 2 = 0 THEN 1 ELSE 0 END) AS dlon,
         ((id * 91) % 21 - 10)
           * (CASE WHEN ((id % 120) // 20) % 2 = 0 THEN 1 ELSE 0 END) AS dlat
  FROM ids
), walked AS (
  SELECT user_id, seq,
         SUM(dlon) OVER (PARTITION BY user_id ORDER BY seq) AS x,
         SUM(dlat) OVER (PARTITION BY user_id ORDER BY seq) AS y
  FROM fixes
), cells AS (
  SELECT user_id, seq,
         CAST(FLOOR(x / {CELL}.0) AS BIGINT) AS o_cx,
         CAST(FLOOR(y / {CELL}.0) AS BIGINT) AS o_cy,
         LEAD(CAST(FLOOR(x / {CELL}.0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY seq) AS d_cx,
         LEAD(CAST(FLOOR(y / {CELL}.0) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY seq) AS d_cy
  FROM walked
)
SELECT o_cx, o_cy, d_cx, d_cy, CAST(COUNT(*) AS BIGINT) AS flow
FROM cells
WHERE d_cx IS NOT NULL AND (o_cx != d_cx OR o_cy != d_cy)
GROUP BY 1, 2, 3, 4"""


@register("od_flows", _OD_ORACLE)
def od_flows_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-to-cell movement flows over the seeded block-walk tracks."""
    return od_flows(_traj_fixture(spark))
