"""Local spatial statistics: Getis-Ord Gi* hot spots + local Moran's I.

The classic LISA (local indicators of spatial association) pair over a
cell grid: for every cell of a study window, Gi* z-scores the
ring-neighborhood sum against the global mean/variance (hot/cold
spots), and local Moran's I measures value-neighborhood covariance
(clusters vs outliers).  Catalog use: where do scene acquisitions /
detections / GCP residuals cluster beyond chance — the screening step
before the `empirical_variogram`/`kriging_surface` modeling pass.

Distributed shape: counts per cell (one groupBy over JVM floor
arithmetic), zero-filled over the window by a left join, ring sums via
the same Chebyshev ring-explode equi-join as `surfaces.idw_grid`
(never cells x cells; the ring join keeps edge handling exact because
the zero-filled window table IS the universe), and the four global
moments ride a one-row broadcast cross join.  Everything is pure
column arithmetic — counts and their squares are exact int64, the
z-scores are fixed IEEE expressions (+-*/ and sqrt, all
correctly-rounded per IEEE 754 in both engines), quantized to integer
micro-units for transport.

Oracle: GENERATIVE DuckDB SQL over the identical expression tree —
per-row, hash-exact, no float tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .surfaces import grid_window, with_grid_xy

RES = 12
N = 1 << RES
BOX = (10.2, 46.2, 10.8, 46.8)  # the r0 study window


def _event_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id")
    return ev.select(
        (10.0 + F.pmod(F.col("event_id") * 37, F.lit(2000)) / 1000.0).alias("lon"),
        (46.0 + F.pmod(F.col("event_id") * 91, F.lit(2000)) / 1000.0).alias("lat"),
    )


def cell_counts(points: DataFrame, window: DataFrame) -> DataFrame:
    """(tx, ty, x): point count per window cell, zero-filled."""
    pts = with_grid_xy(points, RES)
    counts = pts.groupBy(
        F.col("cell_x").alias("tx"), F.col("cell_y").alias("ty")
    ).agg(F.count(F.lit(1)).alias("x"))
    return window.join(counts, ["tx", "ty"], "left").select(
        "tx", "ty", F.coalesce(F.col("x"), F.lit(0)).alias("x")
    )


def local_stats(cells: DataFrame) -> DataFrame:
    """(tx, ty, x, m, sj, gi_q, moran_q) — Gi* and local Moran per cell.

    ``cells`` is the zero-filled window table; the ring is Chebyshev
    distance <= 1 INCLUDING self for Gi* (the star variant) and
    excluding self for Moran.
    """
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    ring = cells.select(
        "tx",
        "ty",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("tx") + dx).alias("rx"), (F.col("ty") + dy).alias("ry")
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("nb"),
    ).select("tx", "ty", F.col("nb.rx").alias("rx"), F.col("nb.ry").alias("ry"))
    neigh = ring.join(
        cells.select(
            F.col("tx").alias("rx"), F.col("ty").alias("ry"), F.col("x").alias("xj")
        ),
        ["rx", "ry"],
    ).groupBy("tx", "ty").agg(
        F.count(F.lit(1)).alias("m"), F.sum("xj").alias("sj")
    )
    glob = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    j = cells.join(neigh, ["tx", "ty"]).crossJoin(F.broadcast(glob))
    nn = F.col("n").cast("double")
    xbar = F.col("sx").cast("double") / nn
    s2 = F.col("sxx").cast("double") / nn - xbar * xbar
    s = F.sqrt(s2)
    m = F.col("m").cast("double")
    sj = F.col("sj").cast("double")
    x = F.col("x").cast("double")
    gi = (sj - xbar * m) / (
        s * F.sqrt((nn * m - m * m) / (nn - F.lit(1.0)))
    )
    moran = (x - xbar) / s2 * (sj - x - xbar * (m - F.lit(1.0)))
    q = lambda c: F.floor(c * 1e6 + 0.5).cast("long")  # noqa: E731
    return j.select(
        "tx", "ty", "x", "m", "sj", q(gi).alias("gi_q"), q(moran).alias("moran_q")
    )


def _hotspot_oracle() -> str:
    xmin, ymin, xmax, ymax = BOX
    tx0, tx1 = int((xmin + 180.0) / 360.0 * N), int((xmax + 180.0) / 360.0 * N)
    ty0, ty1 = int((ymin + 90.0) / 180.0 * N), int((ymax + 90.0) / 180.0 * N)
    return f"""
WITH pts AS (
  SELECT 10.0 + (event_id * 37 % 2000) / 1000.0 AS lon,
         46.0 + (event_id * 91 % 2000) / 1000.0 AS lat
  FROM events),
px AS (
  SELECT CAST(floor((lon + 180.0) / 360.0 * {N}) AS BIGINT) AS tx,
         CAST(floor((lat + 90.0) / 180.0 * {N}) AS BIGINT) AS ty
  FROM pts),
w AS (
  SELECT tx, unnest(range({ty0}, {ty1} + 1)) AS ty
  FROM (SELECT unnest(range({tx0}, {tx1} + 1)) AS tx)),
cells AS (
  SELECT w.tx, w.ty, CAST(COUNT(px.tx) AS BIGINT) AS x
  FROM w LEFT JOIN px ON px.tx = w.tx AND px.ty = w.ty
  GROUP BY w.tx, w.ty),
neigh AS (
  SELECT a.tx, a.ty, CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(b.x) AS BIGINT) AS sj
  FROM cells a JOIN cells b
    ON abs(b.tx - a.tx) <= 1 AND abs(b.ty - a.ty) <= 1
  GROUP BY a.tx, a.ty),
gstats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM cells)
SELECT c.tx, c.ty, c.x, g2.m, g2.sj,
  CAST(FLOOR(((CAST(g2.sj AS DOUBLE) - (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)) * CAST(g2.m AS DOUBLE))
    / (sqrt(CAST(g.sxx AS DOUBLE) / CAST(g.n AS DOUBLE)
            - (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)) * (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)))
       * sqrt((CAST(g.n AS DOUBLE) * CAST(g2.m AS DOUBLE) - CAST(g2.m AS DOUBLE) * CAST(g2.m AS DOUBLE))
              / (CAST(g.n AS DOUBLE) - 1.0)))) * 1e6 + 0.5) AS BIGINT) AS gi_q,
  CAST(FLOOR(((CAST(c.x AS DOUBLE) - CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE))
    / (CAST(g.sxx AS DOUBLE) / CAST(g.n AS DOUBLE)
       - (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)) * (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)))
    * (CAST(g2.sj AS DOUBLE) - CAST(c.x AS DOUBLE)
       - (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE)) * (CAST(g2.m AS DOUBLE) - 1.0))) * 1e6 + 0.5)
       AS BIGINT) AS moran_q
FROM cells c JOIN neigh g2 ON g2.tx = c.tx AND g2.ty = c.ty
CROSS JOIN gstats g
"""


@register("hotspot_gi", _hotspot_oracle)
def hotspot_gi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* + local Moran's I z-surfaces of the event-point
    density over the r0 study window — generative SQL oracle,
    micro-unit quantized."""
    points = _event_points(spark, sf_dir)
    window = grid_window(spark, RES, *BOX)
    return local_stats(cell_counts(points, window))
