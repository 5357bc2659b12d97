"""Map matching — snap GPS pings to the nearest road segment within a
radius.

The geometric core of trajectory-to-network alignment (the distance step
of ST-Matching, Lou et al., ACM GIS 2009): for each ping, find the road
segment minimizing point-to-segment distance, subject to a match radius.

Exactness: pings and segment endpoints are INTEGER grid coordinates.
Point-to-segment distance uses the exact integer classification
(dot <= 0 -> |AP|^2; dot >= L -> |BP|^2; else (|AP|^2*L - dot^2)/L with
one double division of exact int64s), so the value — and the argmin with
the (distance, seg_id) tie-break — is identical in Spark and DuckDB.
Products are bounded by span^4; callers keep per-tile coordinate spans
under ~50k units (same contract as Douglas-Peucker).

Scale shape (100 TB of pings): candidate generation is a cell equi-join —
each ping emits its 3x3 ring at cell size 2^cell_shift >= radius
(arithmetic shift = exact floor division), each segment emits its
bbox-cover cells (conservative, complete).  No broadcast of the road
network is required, so continental road sets scale on the cell key; the
refine is one windowed top-1 per ping (WindowGroupLimit).  The registered
oracle is the independent BRUTE-FORCE pings x segments argmin, so a
driver match proves candidate completeness, not just formula agreement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

# exact point-to-segment squared distance; inputs px,py,ax,ay,bx,by integer
_D2 = """CASE
  WHEN (px-ax)*(bx-ax) + (py-ay)*(by-ay) <= 0
    THEN CAST((px-ax)*(px-ax) + (py-ay)*(py-ay) AS DOUBLE)
  WHEN (px-ax)*(bx-ax) + (py-ay)*(by-ay) >= (bx-ax)*(bx-ax) + (by-ay)*(by-ay)
    THEN CAST((px-bx)*(px-bx) + (py-by)*(py-by) AS DOUBLE)
  ELSE CAST(((px-ax)*(px-ax) + (py-ay)*(py-ay)) * ((bx-ax)*(bx-ax) + (by-ay)*(by-ay))
            - ((px-ax)*(bx-ax) + (py-ay)*(by-ay)) * ((px-ax)*(bx-ax) + (py-ay)*(by-ay)) AS DOUBLE)
       / CAST((bx-ax)*(bx-ax) + (by-ay)*(by-ay) AS DOUBLE)
END"""


def map_match(
    pings: DataFrame, roads: DataFrame, r2: int, cell_shift: int
) -> DataFrame:
    """(point_id, seg_id, dist_q): nearest segment within sqrt(r2) per ping.

    ``pings``: (point_id, px, py); ``roads``: (seg_id, ax, ay, bx, by) with
    A != B.  ``2^cell_shift`` must be >= ceil(sqrt(r2)) for completeness
    (checked).  dist_q = ROUND(d2 * 1e6) — exact micro-unit quantization.
    Pings with no segment in range are absent from the result.
    """
    import math

    r = math.isqrt(int(r2))
    if r * r < r2:
        r += 1
    if (1 << cell_shift) < r:
        raise ValueError(f"cell 2^{cell_shift} smaller than radius {r}")
    c = cell_shift

    ring = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            ring.append(
                F.struct(
                    (F.shiftright("px", c) + dx).alias("gx"),
                    (F.shiftright("py", c) + dy).alias("gy"),
                )
            )
    p_cells = pings.select(
        "point_id", "px", "py", F.explode(F.array(*ring)).alias("g")
    ).select("point_id", "px", "py", F.col("g.gx").alias("gx"), F.col("g.gy").alias("gy"))

    s_cells = roads.select(
        "seg_id", "ax", "ay", "bx", "by",
        F.explode(
            F.expr(
                f"flatten(transform("
                f"sequence(shiftright(least(ax, bx), {c}), shiftright(greatest(ax, bx), {c})),"
                f" gx -> transform("
                f"sequence(shiftright(least(ay, by), {c}), shiftright(greatest(ay, by), {c})),"
                f" gy -> struct(gx AS gx, gy AS gy))))"
            )
        ).alias("g"),
    ).select("seg_id", "ax", "ay", "bx", "by", F.col("g.gx").alias("gx"), F.col("g.gy").alias("gy"))

    cand = (
        p_cells.join(s_cells, ["gx", "gy"])
        .select("point_id", "px", "py", "seg_id", "ax", "ay", "bx", "by")
        .distinct()
        .withColumn("d2", F.expr(_D2))
        .filter(F.col("d2") <= float(r2))
    )
    w = Window.partitionBy("point_id").orderBy("d2", "seg_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "point_id",
            "seg_id",
            F.expr("CAST(ROUND(d2 * 1e6) AS BIGINT)").alias("dist_q"),
        )
    )


# ---------------------------------------------------------------------------
# registered query: street-grid roads + shifted random-walk pings
# ---------------------------------------------------------------------------

_R2 = 10000  # r = 100 grid units; streets are 200 apart -> all in-box pings match


def _street_values() -> list[tuple[int, int, int, int, int]]:
    segs = []
    sid = 0
    for k in range(11):  # horizontal y = 200k and vertical x = 200k, 0..2000
        segs.append((sid, 0, 200 * k, 2000, 200 * k)); sid += 1
        segs.append((sid, 200 * k, 0, 200 * k, 2000)); sid += 1
    return segs


_STREETS_SQL = ",\n    ".join(
    f"({s}, {ax}, {ay}, {bx}, {by})" for s, ax, ay, bx, by in _street_values()
)

_PINGS_CTE = """
ev AS (SELECT event_id, ts, user_id,
       (event_id * 37 % 21) - 10 AS dlon, (event_id * 91 % 21) - 10 AS dlat
       FROM events),
pings AS (SELECT event_id AS point_id,
          1000 + SUM(dlon) OVER w AS px, 1000 + SUM(dlat) OVER w AS py
          FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"""

_MATCH_ORACLE = f"""
WITH {_PINGS_CTE[1:]},
roads(seg_id, ax, ay, bx, by) AS (VALUES
    {_STREETS_SQL}),
cand AS (
  SELECT p.point_id, r.seg_id, {_D2.replace('px', 'p.px').replace('py', 'p.py')} AS d2
  FROM pings p, roads r),
hits AS (SELECT point_id, seg_id, d2,
         ROW_NUMBER() OVER (PARTITION BY point_id ORDER BY d2, seg_id) AS rn
         FROM cand WHERE d2 <= {_R2}.0)
SELECT point_id, CAST(seg_id AS BIGINT) AS seg_id,
       CAST(ROUND(d2 * 1e6) AS BIGINT) AS dist_q
FROM hits WHERE rn = 1"""


def _walk_pings(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    d = ev.withColumn(
        "dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10
    ).withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return d.select(
        F.col("event_id").alias("point_id"),
        (F.lit(1000) + F.sum("dlon").over(w)).alias("px"),
        (F.lit(1000) + F.sum("dlat").over(w)).alias("py"),
    )


def _roads_df(spark) -> DataFrame:
    from ..sources.tables import local_df

    return local_df(
        spark, _street_values(), "seg_id long, ax long, ay long, bx long, by long"
    )


@register("map_match", _MATCH_ORACLE)
def map_match_query(spark, sf_dir):
    """Match the random-walk pings to the 22-segment street grid within
    radius 100; the oracle is the brute-force pings x segments argmin with
    the identical integer-exact distance, so the driver match proves the
    cell-ring candidate join is complete."""
    return map_match(_walk_pings(spark, sf_dir), _roads_df(spark), r2=_R2, cell_shift=7)
