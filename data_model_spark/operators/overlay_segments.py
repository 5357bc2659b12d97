"""Exact segment-intersection join (vector overlay of two line layers).

The missing piece between point-in-polygon and polygon overlay: which
segments of layer A cross which segments of layer B (road x river,
coastline x swath edge, trajectory x boundary).  The classic distributed
shape:

* candidates — each segment explodes to the grid cells its BBOX covers
  (bounded: short segments -> <= 4 cells here; cost is output-
  proportional), then ONE (cell_x, cell_y) equi-join;
* exactly-once emit — a pair sharing several cells is counted only in
  the min corner cell of the bbox INTERSECTION (``greatest`` of the two
  per-side min cells — always a shared covered cell because both sides
  cover their full bboxes), the `interval_overlap_join` rule in 2-D: no
  ``distinct`` shuffle;
* exact refine — the CLRS SEGMENTS-INTERSECT predicate (4 orientation
  cross products + collinear-touch on-segment checks) in pure int64
  arithmetic: coordinates are integers, so there is no epsilon anywhere.

The refine predicate is ONE SQL string evaluated by ``F.expr`` in Spark
and verbatim by DuckDB — a single source of truth for both engines.  The
oracle is the brute-force theta join (no cells at all), so the driver
hash-match independently proves BOTH cover completeness (a missed
candidate drops a row) and the exactly-once emit (a duplicate emit adds
one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

CELL = 64  # candidate grid pitch; >= max segment extent -> <=4 cells/segment

# endpoint derivation (integer, engine-shared): base point hashed onto a
# 1024-grid shifted by +64 so every derived coordinate stays non-negative
# (integer `div` == floor division only holds for non-negative operands),
# delta in [-64, 64] -> segment extent <= CELL on each axis
_SEG_FMT = {
    "x0": "64 + ({k} * 7919) % 1024",
    "y0": "64 + ({k} * 104729) % 1024",
    "dx": "(({k} * 131) % 129) - 64",
    "dy": "(({k} * 197) % 129) - 64",
}


def _seg_exprs(key: str, p: str) -> dict[str, str]:
    e = {n: f.format(k=key) for n, f in _SEG_FMT.items()}
    return {
        f"{p}x0": e["x0"],
        f"{p}y0": e["y0"],
        f"{p}x1": f"{e['x0']} + {e['dx']}",
        f"{p}y1": f"{e['y0']} + {e['dy']}",
    }


# CLRS SEGMENTS-INTERSECT over columns (ax0, ay0, ax1, ay1, bx0, by0, bx1,
# by1): proper crossing via strict orientation sign changes, plus the four
# collinear-touch cases.  Valid Spark SQL AND DuckDB SQL verbatim.
_D = {
    "d1": "(bx1-bx0)*(ay0-by0) - (by1-by0)*(ax0-bx0)",
    "d2": "(bx1-bx0)*(ay1-by0) - (by1-by0)*(ax1-bx0)",
    "d3": "(ax1-ax0)*(by0-ay0) - (ay1-ay0)*(bx0-ax0)",
    "d4": "(ax1-ax0)*(by1-ay0) - (ay1-ay0)*(bx1-ax0)",
}


def _on(px: str, py: str, sx0: str, sy0: str, sx1: str, sy1: str) -> str:
    return (
        f"{px} BETWEEN least({sx0},{sx1}) AND greatest({sx0},{sx1})"
        f" AND {py} BETWEEN least({sy0},{sy1}) AND greatest({sy0},{sy1})"
    )


INTERSECT_PRED = f"""(
  ((({_D['d1']}) > 0 AND ({_D['d2']}) < 0) OR (({_D['d1']}) < 0 AND ({_D['d2']}) > 0))
  AND
  ((({_D['d3']}) > 0 AND ({_D['d4']}) < 0) OR (({_D['d3']}) < 0 AND ({_D['d4']}) > 0))
) OR (({_D['d1']}) = 0 AND {_on('ax0', 'ay0', 'bx0', 'by0', 'bx1', 'by1')})
  OR (({_D['d2']}) = 0 AND {_on('ax1', 'ay1', 'bx0', 'by0', 'bx1', 'by1')})
  OR (({_D['d3']}) = 0 AND {_on('bx0', 'by0', 'ax0', 'ay0', 'ax1', 'ay1')})
  OR (({_D['d4']}) = 0 AND {_on('bx1', 'by1', 'ax0', 'ay0', 'ax1', 'ay1')})"""


def _cover(seg: DataFrame, p: str) -> DataFrame:
    """Explode to covered bbox cells; carry the per-segment min cell."""
    x0, y0, x1, y1 = f"{p}x0", f"{p}y0", f"{p}x1", f"{p}y1"
    return (
        seg.withColumn("_min_cx", F.expr(f"least({x0},{x1}) div {CELL}"))
        .withColumn("_min_cy", F.expr(f"least({y0},{y1}) div {CELL}"))
        .withColumn(
            "cell_x",
            F.explode(
                F.sequence(
                    F.col("_min_cx"), F.expr(f"greatest({x0},{x1}) div {CELL}")
                )
            ),
        )
        .withColumn(
            "cell_y",
            F.explode(
                F.sequence(
                    F.col("_min_cy"), F.expr(f"greatest({y0},{y1}) div {CELL}")
                )
            ),
        )
        .withColumnRenamed("_min_cx", f"{p}min_cx")
        .withColumnRenamed("_min_cy", f"{p}min_cy")
    )


def segment_intersection_join(a: DataFrame, b: DataFrame) -> DataFrame:
    """(a_id, b_id) pairs of exactly-intersecting segments.

    ``a``: (a_id, ax0, ay0, ax1, ay1) int64; ``b`` analogous.  One cell
    equi-join, exactly-once emit, exact integer refine.
    """
    ca, cb = _cover(a, "a"), _cover(b, "b")
    joined = ca.join(cb, ["cell_x", "cell_y"])
    emitted = joined.filter(
        (F.col("cell_x") == F.greatest("amin_cx", "bmin_cx"))
        & (F.col("cell_y") == F.greatest("amin_cy", "bmin_cy"))
    )
    return emitted.filter(F.expr(INTERSECT_PRED)).select("a_id", "b_id")


def _segments_df(df: DataFrame, key: str, id_out: str, p: str) -> DataFrame:
    exprs = _seg_exprs(key, p)
    return df.select(
        F.col(key).alias(id_out),
        *[F.expr(sql).cast("long").alias(name) for name, sql in exprs.items()],
    )


def _oracle() -> str:
    a = ",\n         ".join(
        f"CAST({sql} AS BIGINT) AS {n}"
        for n, sql in _seg_exprs("c_custkey", "a").items()
    )
    b = ",\n         ".join(
        f"CAST({sql} AS BIGINT) AS {n}"
        for n, sql in _seg_exprs("s_suppkey", "b").items()
    )
    return f"""
WITH a AS (
  SELECT c_custkey AS a_id,
         {a}
  FROM customer
), b AS (
  SELECT s_suppkey AS b_id,
         {b}
  FROM supplier
)
SELECT a_id, b_id FROM a, b
WHERE {INTERSECT_PRED}"""


@register("segment_intersections", _oracle)
def segment_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact vector-overlay intersection join between customer-derived and
    supplier-derived segment layers; brute-force theta-join oracle proves
    cover completeness AND the exactly-once cell emit."""
    a = _segments_df(load_table(spark, sf_dir, "customer"), "c_custkey", "a_id", "a")
    b = _segments_df(load_table(spark, sf_dir, "supplier"), "s_suppkey", "b_id", "b")
    return segment_intersection_join(a, b)
