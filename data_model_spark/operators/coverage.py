"""Detection coverage QA: exact box-union area and score calibration.

Two corpus-auditing operators over the detection fixture:

* ``box_union_area`` — exact area of the union of each scene's boxes
  (how much of the image the annotations actually cover — the
  denominator of any labeled-fraction metric).  FULLY RELATIONAL: the
  classic sweep decomposes into (1) vertical strips between consecutive
  x-boundaries (a scene-local ``lead`` window), (2) a scene-equi join
  attaching each box to the strips it spans (coverage of a strip is
  all-or-nothing because strips never cross a boundary), (3) interval
  union per strip by gaps-and-islands (running ``max(y1)`` window, new
  island when ``y0`` clears it), (4) two aggregations.  Every window /
  join partition is bounded by the per-scene detector output cap — no
  global sort, no kernel, and the oracle is the IDENTICAL algorithm in
  DuckDB SQL (not a VALUES literal).
* ``score_calibration_fp`` — reliability bins: predictions bucketed by
  score decile, per bin (n_pred, n_tp) from the COCO greedy matching
  (``boxes.match_flags``).  A well-calibrated detector's tp-rate rises
  with the bin; the exact integer counts are the fingerprint.  Oracle =
  sequential matching replay, aggregated to 10 VALUES rows.

Reference context: no detection ops in the reference; these extend the
bbox-extent aggregations it does have (``s2_multiscale.py:654-661``,
A12-A13) from per-array extents to label-coverage semantics.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import fixture_range, load_table
from .boxes import _FP_N, _GT_N, _SQL_BOXES, N_SCENES, _np_boxes, _np_gt
from .boxes import boxes_from_ids, greedy_match_np, gt_from_ids, match_flags
from .registry import register

# ---------------------------------------------------------------------------
# exact union area (relational sweep)
# ---------------------------------------------------------------------------


def box_union_area(boxes: DataFrame) -> DataFrame:
    """(scene, n_boxes, sum_area, union_area) with union_area exact."""
    xs = (
        boxes.select("scene", F.col("x0").alias("x"))
        .unionByName(boxes.select("scene", F.col("x1").alias("x")))
        .distinct()
    )
    w_strip = Window.partitionBy("scene").orderBy("x")
    strips = xs.select(
        "scene", F.col("x").alias("xl"), F.lead("x").over(w_strip).alias("xr")
    ).filter(F.col("xr").isNotNull())
    # a strip lies between consecutive boundaries, so a box covers it
    # entirely or not at all
    sj = strips.join(boxes, "scene").filter(
        (F.col("x0") <= F.col("xl")) & (F.col("xr") <= F.col("x1"))
    )
    w_prev = (
        Window.partitionBy("scene", "xl")
        .orderBy("y0", "y1")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("scene", "xl")
        .orderBy("y0", "y1")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = sj.select(
        "scene",
        "xl",
        "xr",
        "y0",
        "y1",
        F.when(
            F.col("y0") > F.coalesce(F.max("y1").over(w_prev), F.lit(-1)), 1
        )
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "scene", "xl", "xr", "y0", "y1",
        F.sum("new_island").over(w_run).alias("grp"),
    )
    merged = islands.groupBy("scene", "xl", "xr", "grp").agg(
        F.min("y0").alias("g0"), F.max("y1").alias("g1")
    )
    per_scene = merged.groupBy("scene").agg(
        F.sum((F.col("xr") - F.col("xl")) * (F.col("g1") - F.col("g0"))).alias(
            "union_area"
        )
    )
    totals = boxes.groupBy("scene").agg(
        F.count("*").alias("n_boxes"), F.sum("area").alias("sum_area")
    )
    return totals.join(per_scene, "scene").select(
        "scene", "n_boxes", "sum_area", "union_area"
    )


_UNION_ORACLE = f"""
WITH b AS ({_SQL_BOXES}),
xs AS (SELECT DISTINCT scene, x0 AS x FROM b
       UNION SELECT DISTINCT scene, x1 FROM b),
strips AS (SELECT scene, x AS xl,
                  LEAD(x) OVER (PARTITION BY scene ORDER BY x) AS xr
           FROM xs),
sj AS (SELECT s.scene, s.xl, s.xr, b.y0, b.y1
       FROM strips s JOIN b ON s.scene = b.scene
       WHERE s.xr IS NOT NULL AND b.x0 <= s.xl AND s.xr <= b.x1),
flg AS (SELECT scene, xl, xr, y0, y1,
               CASE WHEN y0 > COALESCE(MAX(y1) OVER (
                     PARTITION BY scene, xl ORDER BY y0, y1
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS new_island
        FROM sj),
isl AS (SELECT scene, xl, xr, y0, y1,
               SUM(new_island) OVER (
                     PARTITION BY scene, xl ORDER BY y0, y1
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        FROM flg),
mrg AS (SELECT scene, xl, xr, grp, MIN(y0) AS g0, MAX(y1) AS g1
        FROM isl GROUP BY 1, 2, 3, 4),
ua AS (SELECT scene, SUM((xr - xl) * (g1 - g0)) AS union_area
       FROM mrg GROUP BY 1),
tot AS (SELECT scene, COUNT(*) AS n_boxes, SUM(area) AS sum_area
        FROM b GROUP BY 1)
SELECT t.scene AS scene, CAST(t.n_boxes AS BIGINT) AS n_boxes,
       CAST(t.sum_area AS BIGINT) AS sum_area,
       CAST(u.union_area AS BIGINT) AS union_area
FROM tot t JOIN ua u ON t.scene = u.scene"""


@register("box_union_area", _UNION_ORACLE)
def box_union_area_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-scene union area of the event-derived boxes (scales
    with sf); the oracle runs the identical strip-sweep in DuckDB."""
    return box_union_area(boxes_from_ids(load_table(spark, sf_dir, "events")))


def union_area_np(b: dict, idx: np.ndarray) -> int:
    """Independent NumPy sweep (pytest reference — NOT shared with the
    engine): strip decomposition + per-strip boolean y-coverage."""
    xs = np.unique(np.concatenate([b["x0"][idx], b["x1"][idx]]))
    total = 0
    for xl, xr in zip(xs[:-1], xs[1:]):
        cover = np.zeros(2048, dtype=bool)
        for i in idx:
            if b["x0"][i] <= xl and xr <= b["x1"][i]:
                cover[b["y0"][i] : b["y1"][i]] = True
        total += int(xr - xl) * int(cover.sum())
    return total


# ---------------------------------------------------------------------------
# score calibration bins (fixture + VALUES replay)
# ---------------------------------------------------------------------------

_BIN = 100  # score in [0, 1000) -> 10 reliability bins


def score_calibration(pred: DataFrame, gt: DataFrame) -> DataFrame:
    flags = match_flags(pred, gt)
    return (
        flags.groupBy(F.expr(f"score div {_BIN}").alias("bin"))
        .agg(
            F.count("*").alias("n_pred"),
            F.sum(F.col("matched").cast("long")).alias("n_tp"),
        )
    )


def _calib_replay() -> list[tuple]:
    pred = _np_boxes(np.arange(_FP_N))
    gt = _np_gt(np.arange(_GT_N))
    matched = np.zeros(_FP_N, dtype=bool)
    for scene in range(N_SCENES):
        pm, gm = pred["scene"] == scene, gt["scene"] == scene
        tp_p, _ = greedy_match_np(
            {c: v[pm] for c, v in pred.items()},
            {c: v[gm] for c, v in gt.items()},
        )
        matched[np.asarray(tp_p, dtype=np.int64)] = True
    bins = pred["score"] // _BIN
    return [
        (int(b), int((bins == b).sum()), int(matched[bins == b].sum()))
        for b in np.unique(bins)
    ]


def _calib_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [("bin", "BIGINT"), ("n_pred", "BIGINT"), ("n_tp", "BIGINT")],
        _calib_replay(),
    )


@register("score_calibration_fp", _calib_oracle)
def score_calibration_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins of the 4000-pred / 2000-gt matching fixture;
    exact per-decile (n_pred, n_tp) vs the sequential replay."""
    pred = boxes_from_ids(
        fixture_range(spark, _FP_N).select(F.col("id").alias("event_id"))
    )
    gt = gt_from_ids(fixture_range(spark, _GT_N).select(F.col("id").alias("gt_id")))
    return score_calibration(pred, gt)
