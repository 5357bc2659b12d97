"""Spatial autocorrelation statistics over the cell grid — global Moran's I
and local Getis-Ord Gi* hotspots.

Public methods: Moran (Biometrika 1950) as formulated for local indicators
by Anselin (Geog. Analysis 1995); Gi* from Ord & Getis (Geog. Analysis
1995).  Observations are the nonzero point-count cells at a resolution;
weights are binary queen (8-neighbor) adjacency *within the observed cell
set*, with the same lon-wrap/lat-clamp ring rule as ``spatial.radius_join``
and ``spatial.cell_heatmap``.

Exactness: with integer counts ``c_i``, mean-centering is done on the
*n-scaled* values ``nz_i = n*c_i - t`` (t = total count), so every Moran
numerator/denominator term is an exact int64 and

    I = (n / S0) * sum_adj(nz_i * nz_j) / sum(nz_i^2)

is a ratio of exact integers.  The reported ``moran_i_nano`` / ``gi_z_nano``
quantize the final double with the shared nanonat idiom (identical
expression trees both engines), so the driver hash match is bit-exact.
Int64 headroom: terms are bounded by (n_cells * total)^2 — fine to ~3e9
point-cell mass; beyond that the same plan runs with double sums (noted,
not needed at any test SF).

Scale shape (100 TB): one point->cell count aggregation (map-side
combinable — the ring logic touches cell COUNTS, not points), one 9x JVM
ring explode of the count table, one cell-keyed equi-join back to counts,
and constant-size final aggregates.  No Python UDFs, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..cache import track
from ..functions import cells
from .registry import register
from .spatial import with_point_cell

_OFFS = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]

_MORAN_NANO = (
    "CAST(ROUND((CAST(nc AS DOUBLE) * num)"
    " / (CAST(s0 AS DOUBLE) * (nc * (nc * sumsq - t * t))) * 1e9) AS BIGINT)"
)
_GI_NANO = (
    "CAST(ROUND(((CAST(ring_sum AS DOUBLE) - (CAST(t AS DOUBLE) / nc) * k_ring)"
    " / (SQRT(CAST(sumsq AS DOUBLE) / nc - (CAST(t AS DOUBLE) / nc) * (CAST(t AS DOUBLE) / nc))"
    " * SQRT((CAST(nc AS DOUBLE) * k_ring - CAST(k_ring AS DOUBLE) * k_ring)"
    " / (nc - 1.0)))) * 1e9) AS BIGINT)"
)


def cell_counts(points: DataFrame, res: int, lon="lon", lat="lat") -> DataFrame:
    return (
        with_point_cell(points, res, lon, lat)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
    )


def neighbor_pairs(counts: DataFrame, res: int) -> DataFrame:
    """(cell, n_src, tc, n_dst, is_self) — observed 3x3 ring pairs.

    Lon wraps mod the grid width, lat clamps at the poles; only pairs whose
    target cell is itself observed survive the equi-join.
    """
    n = 1 << res
    cx = F.col("cell").bitwiseAND(F.lit(cells._XY_MASK))
    cy = F.shiftright("cell", cells._Y_SHIFT).bitwiseAND(F.lit(cells._XY_MASK))
    terms = []
    for dx, dy in _OFFS:
        ny = cy + F.lit(dy)
        nc = (
            F.lit(res << cells._RES_SHIFT)
            .bitwiseOR(F.shiftleft(ny.cast("long"), cells._Y_SHIFT))
            .bitwiseOR(F.pmod(cx + F.lit(dx), F.lit(n)).cast("long"))
        )
        terms.append(
            F.when(
                (ny >= 0) & (ny < n),
                F.struct(nc.alias("tc"), F.lit(dx == 0 and dy == 0).alias("is_self")),
            )
        )
    cand = (
        counts.select("cell", F.col("n").alias("n_src"), F.explode(F.array(*terms)).alias("t"))
        .filter(F.col("t").isNotNull())
        .select("cell", "n_src", F.col("t.tc").alias("tc"), F.col("t.is_self").alias("is_self"))
    )
    dst = counts.select(F.col("cell").alias("tc"), F.col("n").alias("n_dst"))
    return cand.join(dst, "tc")


def _totals(counts: DataFrame) -> DataFrame:
    return counts.agg(
        F.count("*").alias("nc"),
        F.sum("n").alias("t"),
        F.sum(F.col("n") * F.col("n")).alias("sumsq"),
    )


def morans_i(points: DataFrame, res: int, lon="lon", lat="lat") -> DataFrame:
    """One row: (n_cells, s0, num, den, moran_i_nano) — global Moran's I."""
    counts = track(cell_counts(points, res, lon, lat))
    tot = _totals(counts)
    adj = neighbor_pairs(counts, res).filter(~F.col("is_self"))
    agg = adj.crossJoin(F.broadcast(tot)).agg(
        F.count("*").alias("s0"),
        F.sum(
            (F.col("nc") * F.col("n_src") - F.col("t"))
            * (F.col("nc") * F.col("n_dst") - F.col("t"))
        ).alias("num"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("nc").alias("n_cells"),
        "s0",
        "num",
        (F.col("nc") * (F.col("nc") * F.col("sumsq") - F.col("t") * F.col("t"))).alias("den"),
        F.expr(_MORAN_NANO).alias("moran_i_nano"),
    )


def gi_star(points: DataFrame, res: int, lon="lon", lat="lat") -> DataFrame:
    """(cell, n_own, k_ring, ring_sum, gi_z_nano) — local Gi* per observed cell.

    ring_sum/k_ring include the cell itself (the * variant); z follows
    Ord & Getis (1995) with exact integer inputs.
    """
    counts = track(cell_counts(points, res, lon, lat))
    tot = _totals(counts)
    ring = (
        neighbor_pairs(counts, res)
        .groupBy("cell", F.col("n_src").alias("n_own"))
        .agg(F.count("*").alias("k_ring"), F.sum("n_dst").alias("ring_sum"))
    )
    return ring.crossJoin(F.broadcast(tot)).select(
        "cell", "n_own", "k_ring", "ring_sum", F.expr(_GI_NANO).alias("gi_z_nano")
    )


# ---------------------------------------------------------------------------
# registered queries: planted-blob fixture (dense blobs + uniform scatter
# produce strong positive global autocorrelation and blob-cell hotspots)
# ---------------------------------------------------------------------------

_RES = 10


def _grid_ctes(res: int) -> str:
    from .dbscan import _PTS_CTE

    n = 1 << res
    return f"""{_PTS_CTE[1:]},
idx AS (
  SELECT least(greatest(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT), 0), {n - 1}) AS x,
         least(greatest(CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT), 0), {n - 1}) AS y
  FROM pts),
counts AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM idx GROUP BY x, y),
tot AS (SELECT COUNT(*) AS nc, SUM(n) AS t, SUM(n * n) AS sumsq FROM counts),
offs(dx, dy) AS (VALUES (-1,-1),(0,-1),(1,-1),(-1,0),(0,0),(1,0),(-1,1),(0,1),(1,1)),
cand AS (
  SELECT c.x, c.y, c.n AS n_src,
         (c.x + o.dx + {n}) % {n} AS tx, c.y + o.dy AS ty,
         (o.dx = 0 AND o.dy = 0) AS is_self
  FROM counts c, offs o
  WHERE c.y + o.dy >= 0 AND c.y + o.dy < {n}),
pairs AS (
  SELECT c.x, c.y, c.n_src, tt.n AS n_dst, c.is_self
  FROM cand c JOIN counts tt ON tt.x = c.tx AND tt.y = c.ty)"""


def _moran_oracle(res: int) -> str:
    return f"""
WITH {_grid_ctes(res)},
agg AS (
  SELECT COUNT(*) AS s0,
         SUM((tot.nc * p.n_src - tot.t) * (tot.nc * p.n_dst - tot.t)) AS num
  FROM pairs p, tot WHERE NOT p.is_self)
SELECT CAST(nc AS BIGINT) AS n_cells, CAST(s0 AS BIGINT) AS s0,
       CAST(num AS BIGINT) AS num,
       CAST(nc * (nc * sumsq - t * t) AS BIGINT) AS den,
       {_MORAN_NANO} AS moran_i_nano
FROM agg, tot"""


def _gi_oracle(res: int) -> str:
    return f"""
WITH {_grid_ctes(res)},
ring AS (
  SELECT x, y, n_src AS n_own, COUNT(*) AS k_ring, SUM(n_dst) AS ring_sum
  FROM pairs GROUP BY x, y, n_src)
SELECT (CAST({res} AS BIGINT) << 56) | (y << 28) | x AS cell,
       CAST(n_own AS BIGINT) AS n_own, CAST(k_ring AS BIGINT) AS k_ring,
       CAST(ring_sum AS BIGINT) AS ring_sum,
       {_GI_NANO} AS gi_z_nano
FROM ring, tot"""


@register("morans_i", _moran_oracle(_RES))
def morans_i_query(spark, sf_dir):
    """Global Moran's I over the planted-blob cell counts at res 10; the
    oracle replays adjacency, n-scaled centering, and the nanonat ratio."""
    from .dbscan import _blob_points

    return morans_i(_blob_points(spark, sf_dir), res=_RES)


@register("gi_star_hotspots", _gi_oracle(_RES))
def gi_star_query(spark, sf_dir):
    """Local Getis-Ord Gi* per observed cell at res 10 — integer ring sums
    plus the z-score in exact nanonat quantization."""
    from .dbscan import _blob_points

    return gi_star(_blob_points(spark, sf_dir), res=_RES)
