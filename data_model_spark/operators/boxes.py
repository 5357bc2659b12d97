"""Detection-box curation: IoU pair join, suppression, and greedy NMS.

Object-detection training corpora need the same dedup discipline as text:
near-identical boxes (ensemble members, repeated crops, overlapping tile
inference) must be collapsed before the labels are trusted.  Three
operators, all over integer pixel boxes so every comparison is exact:

* ``box_iou_pairs`` — all same-scene pairs with IoU >= 0.3.  The 2D
  analogue of the interval-bucket join (``intervals.py``): each box
  explodes to the fixed 256px grid cells it covers (<= 4 cells at the
  320px max box size), candidates meet on ``(scene, cx, cy)``, and a
  pair is emitted in EXACTLY one cell — the one containing the
  intersection's top-left corner ``(max(x0), max(y0))``, a point both
  boxes cover whenever they overlap — so no distinct is needed.  The
  IoU threshold is the integer cross-multiplication
  ``10*inter >= 3*union``: no floating point anywhere.
* ``box_suppress_keep`` — one-pass suppression (keep a box iff NO
  higher-priority box overlaps it at IoU >= 0.5).  Fully relational:
  the bucketed pair join feeds a left-anti join, so the whole operator
  is two shuffles and SQL-replayable — the distributable cousin of NMS
  used when a strict keep-superset is acceptable.
* ``box_nms_fp`` — TRUE greedy NMS (a suppressed box suppresses nobody)
  per scene via ``applyInPandas``: scenes are independent, and per-scene
  box counts are bounded by the detector's output cap (hundreds), so the
  group is the natural distribution unit; the kernel is the standard
  vectorized O(n^2) suppression loop in NumPy int64.  Greedy's
  keep-set is a superset of one-pass suppression's (a box killed only
  by an itself-suppressed box survives greedy), pinned by a pytest.

Fixture: boxes derive from ``events.event_id`` (pairs/suppress; scales
with sf) or a fixed ``spark.range`` (greedy twin; sf-independent so its
NumPy-replay VALUES oracle is exact at any scale) by pure int64
arithmetic — identical expressions on the Spark and DuckDB sides:
``scene = id % 200``, ``x0 = (id*37) % 704``, ``y0 = (id*59) % 704``,
``w = 64 + (id*17) % 257``, ``h = 64 + (id*23) % 257``,
``score = (id*91) % 1000`` on a 1024px canvas.

Scale shape: the cell explode happens map-side before the one
``(scene, cx, cy)`` shuffle; dense scenes (thousands of boxes) stay
local to their cells, and AQE splits hot cells.  Nothing collects;
no cartesian products (plan-gated in ``tests/test_boxes.py``).

Reference context: the reference repo has no detection operators — this
extends its tile-grid geometry (``conversion/utils.py:161-189`` grid
alignment) to the label-curation layer a 10^12-image corpus needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fixture_range, load_table
from .registry import register

CELL = 256  # candidate-grid pitch; >= no box dimension exceeds 2 cells/axis
CANVAS = 1024
N_SCENES = 200
_FP_N = 4000  # fixed fixture size for the greedy twin


# ---------------------------------------------------------------------------
# box derivation (shared arithmetic, Spark + NumPy + SQL)
# ---------------------------------------------------------------------------


def _boxes_cols(idc):
    """Column expressions deriving a box from an int64 id column."""
    x0 = F.pmod(idc * 37, F.lit(704))
    y0 = F.pmod(idc * 59, F.lit(704))
    w = F.pmod(idc * 17, F.lit(257)) + 64
    h = F.pmod(idc * 23, F.lit(257)) + 64
    return {
        "box_id": idc,
        "scene": F.pmod(idc, F.lit(N_SCENES)),
        "x0": x0,
        "y0": y0,
        "x1": x0 + w,
        "y1": y0 + h,
        "area": w * h,
        "score": F.pmod(idc * 91, F.lit(1000)),
    }


def boxes_from_ids(df: DataFrame, id_col: str = "event_id") -> DataFrame:
    cols = _boxes_cols(F.col(id_col).cast("long"))
    return df.select(*(expr.alias(name) for name, expr in cols.items()))


def _np_boxes(ids: np.ndarray) -> dict[str, np.ndarray]:
    """NumPy replay of ``_boxes_cols`` (int64 throughout)."""
    ids = ids.astype(np.int64)
    x0, y0 = (ids * 37) % 704, (ids * 59) % 704
    w, h = 64 + (ids * 17) % 257, 64 + (ids * 23) % 257
    return {
        "box_id": ids,
        "scene": ids % N_SCENES,
        "x0": x0,
        "y0": y0,
        "x1": x0 + w,
        "y1": y0 + h,
        "area": w * h,
        "score": (ids * 91) % 1000,
    }


_SQL_BOXES = f"""
  SELECT event_id AS box_id, event_id % {N_SCENES} AS scene,
         (event_id*37) % 704 AS x0, (event_id*59) % 704 AS y0,
         (event_id*37) % 704 + 64 + (event_id*17) % 257 AS x1,
         (event_id*59) % 704 + 64 + (event_id*23) % 257 AS y1,
         (64 + (event_id*17) % 257) * (64 + (event_id*23) % 257) AS area,
         (event_id*91) % 1000 AS score
  FROM events"""


# ---------------------------------------------------------------------------
# bucketed IoU pair join
# ---------------------------------------------------------------------------


def iou_pairs(
    boxes: DataFrame,
    iou_num: int = 3,
    iou_den: int = 10,
    with_coords: bool = False,
) -> DataFrame:
    """Same-scene pairs (a_id < b_id) with IoU >= iou_num/iou_den, via the
    2D grid-bucket candidate join with the exactly-once emit rule.
    ``with_coords`` additionally carries both boxes' corner columns
    (ax0..by1) for downstream refine kernels (e.g. exact mask IoU)."""

    def cover(df, side):
        return df.select(
            *[F.col(c).alias(f"{side}{c}") for c in df.columns],
            F.explode(
                F.sequence(
                    (F.col("x0") / CELL).cast("long"),
                    ((F.col("x1") - 1) / CELL).cast("long"),
                )
            ).alias("cx"),
        ).select(
            "*",
            F.explode(
                F.sequence(
                    (F.col(f"{side}y0") / CELL).cast("long"),
                    ((F.col(f"{side}y1") - 1) / CELL).cast("long"),
                )
            ).alias("cy"),
        )

    from ..sources.tables import widen

    # probe side widened: the planner broadcasts one cover side, so the
    # within-cell pair evaluation runs at the OTHER side's parallelism —
    # one partition when boxes come from a single-row-group event file
    ca = cover(widen(boxes), "a").withColumnRenamed("ascene", "scene")
    cb = cover(boxes, "b").withColumnRenamed("bscene", "scene")
    iw = F.least("ax1", "bx1") - F.greatest("ax0", "bx0")
    ih = F.least("ay1", "by1") - F.greatest("ay0", "by0")
    inter = iw * ih
    uni = F.col("aarea") + F.col("barea") - inter
    owner_x = (F.greatest("ax0", "bx0") / CELL).cast("long")
    owner_y = (F.greatest("ay0", "by0") / CELL).cast("long")
    return (
        ca.join(cb, ["scene", "cx", "cy"])
        .filter(
            (F.col("abox_id") < F.col("bbox_id"))
            & (iw > 0)
            & (ih > 0)
            & (F.lit(iou_den) * inter >= F.lit(iou_num) * uni)
            & (F.col("cx") == owner_x)
            & (F.col("cy") == owner_y)
        )
        .select(
            "scene",
            F.col("abox_id").alias("a_id"),
            F.col("bbox_id").alias("b_id"),
            inter.cast("long").alias("inter"),
            uni.cast("long").alias("uni"),
            F.col("ascore").alias("a_score"),
            F.col("bscore").alias("b_score"),
            *(
                [F.col(c) for c in (
                    "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1"
                )]
                if with_coords
                else []
            ),
        )
    )


_IOU_PAIRS_ORACLE = f"""
WITH b AS ({_SQL_BOXES})
SELECT a.scene AS scene, a.box_id AS a_id, b.box_id AS b_id,
       CAST((LEAST(a.x1,b.x1)-GREATEST(a.x0,b.x0))
          * (LEAST(a.y1,b.y1)-GREATEST(a.y0,b.y0)) AS BIGINT) AS inter,
       CAST(a.area + b.area
          - (LEAST(a.x1,b.x1)-GREATEST(a.x0,b.x0))
          * (LEAST(a.y1,b.y1)-GREATEST(a.y0,b.y0)) AS BIGINT) AS uni,
       a.score AS a_score, b.score AS b_score
FROM b a JOIN b b ON a.scene = b.scene AND a.box_id < b.box_id
WHERE LEAST(a.x1,b.x1) - GREATEST(a.x0,b.x0) > 0
  AND LEAST(a.y1,b.y1) - GREATEST(a.y0,b.y0) > 0
  AND 10 * (LEAST(a.x1,b.x1)-GREATEST(a.x0,b.x0))
         * (LEAST(a.y1,b.y1)-GREATEST(a.y0,b.y0))
   >= 3 * (a.area + b.area
         - (LEAST(a.x1,b.x1)-GREATEST(a.x0,b.x0))
         * (LEAST(a.y1,b.y1)-GREATEST(a.y0,b.y0)))"""


@register("box_iou_pairs", _IOU_PAIRS_ORACLE)
def box_iou_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-scene detection-box pairs at IoU >= 0.3 over event-derived
    boxes; the oracle is the direct theta self-join, so a driver match
    proves 2D bucket-cover completeness and the owner-cell emit rule."""
    boxes = boxes_from_ids(load_table(spark, sf_dir, "events"))
    return iou_pairs(boxes)


# ---------------------------------------------------------------------------
# one-pass suppression (relational keep-set)
# ---------------------------------------------------------------------------


def suppress_keep(boxes: DataFrame) -> DataFrame:
    """Keep a box iff no strictly-higher-priority box (score desc, id asc)
    in its scene overlaps it at IoU >= 0.5.  Two shuffles total: the
    bucketed pair join, then a left-anti join on the loser ids."""
    pairs = iou_pairs(boxes, iou_num=5, iou_den=10)
    a_wins = (F.col("a_score") > F.col("b_score")) | (
        (F.col("a_score") == F.col("b_score")) & (F.col("a_id") < F.col("b_id"))
    )
    losers = pairs.select(
        F.when(a_wins, F.col("b_id")).otherwise(F.col("a_id")).alias("box_id")
    )
    return (
        boxes.join(losers, "box_id", "left_anti")
        .select("scene", "box_id", "score")
    )


_SUPPRESS_ORACLE = f"""
WITH b AS ({_SQL_BOXES})
SELECT k.scene AS scene, k.box_id AS box_id, k.score AS score
FROM b k WHERE NOT EXISTS (
  SELECT 1 FROM b h
  WHERE h.scene = k.scene AND h.box_id <> k.box_id
    AND (h.score > k.score OR (h.score = k.score AND h.box_id < k.box_id))
    AND LEAST(h.x1,k.x1) - GREATEST(h.x0,k.x0) > 0
    AND LEAST(h.y1,k.y1) - GREATEST(h.y0,k.y0) > 0
    AND 10 * (LEAST(h.x1,k.x1)-GREATEST(h.x0,k.x0))
           * (LEAST(h.y1,k.y1)-GREATEST(h.y0,k.y0))
     >= 5 * (h.area + k.area
           - (LEAST(h.x1,k.x1)-GREATEST(h.x0,k.x0))
           * (LEAST(h.y1,k.y1)-GREATEST(h.y0,k.y0))))"""


@register("box_suppress_keep", _SUPPRESS_ORACLE)
def box_suppress_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass suppression keep-set at IoU >= 0.5 (relational NMS
    relaxation); oracle is the NOT EXISTS formulation."""
    return suppress_keep(boxes_from_ids(load_table(spark, sf_dir, "events")))


# ---------------------------------------------------------------------------
# true greedy NMS (per-scene kernel) + NumPy-replay oracle
# ---------------------------------------------------------------------------


def greedy_nms_np(
    ids: np.ndarray,
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    score: np.ndarray,
    iou_num: int = 5,
    iou_den: int = 10,
) -> np.ndarray:
    """Indices kept by greedy NMS: visit by (score desc, id asc); a kept
    box suppresses every later box with IoU >= iou_num/iou_den.  All
    int64; the comparison is the exact cross-multiplication."""
    order = np.lexsort((ids, -score.astype(np.int64)))
    area = (x1 - x0) * (y1 - y0)
    alive = np.ones(len(ids), dtype=bool)
    keep = []
    for pos, i in enumerate(order):
        if not alive[pos]:
            continue
        keep.append(i)
        rest = order[pos + 1 :]
        iw = np.minimum(x1[i], x1[rest]) - np.maximum(x0[i], x0[rest])
        ih = np.minimum(y1[i], y1[rest]) - np.maximum(y0[i], y0[rest])
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        bad = (iw > 0) & (ih > 0) & (
            iou_den * inter >= iou_num * (area[i] + area[rest] - inter)
        )
        alive[pos + 1 :] &= ~bad
    return np.asarray(keep, dtype=np.int64)


def _nms_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    arr = {c: pdf[c].to_numpy(dtype=np.int64) for c in pdf.columns}
    kept = greedy_nms_np(
        arr["box_id"], arr["x0"], arr["y0"], arr["x1"], arr["y1"], arr["score"]
    )
    out = pdf.iloc[kept]
    return out[["scene", "box_id", "score"]]


def greedy_nms(boxes: DataFrame) -> DataFrame:
    """Per-scene greedy NMS at IoU >= 0.5.  One shuffle (hash on scene);
    the kernel is Arrow-batched NumPy, bounded by the per-scene box cap."""
    return boxes.groupBy("scene").applyInPandas(
        _nms_kernel, "scene bigint, box_id bigint, score bigint"
    )


def _nms_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    b = _np_boxes(np.arange(_FP_N))
    rows = []
    for scene in range(N_SCENES):
        m = b["scene"] == scene
        kept = greedy_nms_np(
            b["box_id"][m], b["x0"][m], b["y0"][m],
            b["x1"][m], b["y1"][m], b["score"][m],
        )
        ids = b["box_id"][m][kept]
        rows.extend(
            (scene, int(i), int((i * 91) % 1000)) for i in sorted(ids.tolist())
        )
    return _values_sql(
        [("scene", "BIGINT"), ("box_id", "BIGINT"), ("score", "BIGINT")], rows
    )


@register("box_nms_fp", _nms_fp_oracle)
def box_nms_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True greedy NMS over the fixed 4000-box fixture (20 boxes/scene),
    hash-checked against the pure-NumPy greedy replay; sf-independent so
    the VALUES oracle is exact at every scale."""
    ids = fixture_range(spark, _FP_N).select(F.col("id").alias("event_id"))
    return greedy_nms(boxes_from_ids(ids))


# ---------------------------------------------------------------------------
# COCO-style greedy prediction <-> ground-truth matching (label QA)
# ---------------------------------------------------------------------------

_GT_N = 2000  # gt g twins prediction 2g, jittered a few px


def _np_gt(gids: np.ndarray) -> dict[str, np.ndarray]:
    """Ground-truth replay: gt g = prediction 2g shifted by a
    deterministic jitter (|dx| <= 32, |dy| <= 30): large boxes stay
    above IoU 0.5, small boxes at max shift drop below it — so the
    fixture has real false negatives and contended matches."""
    gids = gids.astype(np.int64)
    b = _np_boxes(2 * gids)
    dx, dy = (gids * 13) % 65 - 32, (gids * 7) % 61 - 30
    return {
        "gt_id": gids,
        "scene": b["scene"],
        "x0": b["x0"] + dx,
        "y0": b["y0"] + dy,
        "x1": b["x1"] + dx,
        "y1": b["y1"] + dy,
    }


def gt_from_ids(df: DataFrame, id_col: str = "gt_id") -> DataFrame:
    g = F.col(id_col).cast("long")
    b = _boxes_cols(g * 2)
    dx = F.pmod(g * 13, F.lit(65)) - 32
    dy = F.pmod(g * 7, F.lit(61)) - 30
    return df.select(
        g.alias("gt_id"),
        b["scene"].alias("scene"),
        (b["x0"] + dx).alias("x0"),
        (b["y0"] + dy).alias("y0"),
        (b["x1"] + dx).alias("x1"),
        (b["y1"] + dy).alias("y1"),
    )


def greedy_match_np(pred: dict, gt: dict, iou_num: int = 5, iou_den: int = 10):
    """COCO-style greedy matching within one scene: predictions visit by
    (score desc, id asc); each takes the unmatched gt with the highest
    IoU >= iou_num/iou_den (exact cross-multiplied comparisons; ties ->
    lowest gt_id).  Returns (tp_pred_ids, tp_gt_ids) as sorted lists."""
    order = np.lexsort((pred["box_id"], -pred["score"].astype(np.int64)))
    parea = (pred["x1"] - pred["x0"]) * (pred["y1"] - pred["y0"])
    garea = (gt["x1"] - gt["x0"]) * (gt["y1"] - gt["y0"])
    taken = np.zeros(len(gt["gt_id"]), dtype=bool)
    tp_p, tp_g = [], []
    for i in order:
        iw = np.minimum(pred["x1"][i], gt["x1"]) - np.maximum(pred["x0"][i], gt["x0"])
        ih = np.minimum(pred["y1"][i], gt["y1"]) - np.maximum(pred["y0"][i], gt["y0"])
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        uni = parea[i] + garea - inter
        ok = (~taken) & (iw > 0) & (ih > 0) & (iou_den * inter >= iou_num * uni)
        if not ok.any():
            continue
        # argmax IoU by exact cross-multiplication, tie -> lowest gt_id
        best = -1
        for j in np.flatnonzero(ok):
            if best < 0 or inter[j] * uni[best] > inter[best] * uni[j]:
                best = j
            elif inter[j] * uni[best] == inter[best] * uni[j] and (
                gt["gt_id"][j] < gt["gt_id"][best]
            ):
                best = j
        taken[best] = True
        tp_p.append(int(pred["box_id"][i]))
        tp_g.append(int(gt["gt_id"][best]))
    return sorted(tp_p), sorted(tp_g)


def _match_kernel(key, pdf_pred: pd.DataFrame, pdf_gt: pd.DataFrame) -> pd.DataFrame:
    pred = {c: pdf_pred[c].to_numpy(dtype=np.int64) for c in pdf_pred.columns}
    gt = {c: pdf_gt[c].to_numpy(dtype=np.int64) for c in pdf_gt.columns}
    if len(pdf_gt) == 0:
        tp_p, tp_g = [], []
    else:
        tp_p, tp_g = greedy_match_np(pred, gt)
    return pd.DataFrame(
        {
            "scene": [int(key[0])],
            "n_pred": [len(pdf_pred)],
            "n_gt": [len(pdf_gt)],
            "n_tp": [len(tp_p)],
            "tp_pred_sum": [int(np.sum(tp_p, dtype=np.int64)) if tp_p else 0],
            "tp_gt_sum": [int(np.sum(tp_g, dtype=np.int64)) if tp_g else 0],
        }
    )


def match_stats(pred: DataFrame, gt: DataFrame) -> DataFrame:
    """Per-scene detection-eval counts (n_pred, n_gt, n_tp) plus exact
    matched-id sums as the fingerprint.  Scenes cogroup independently:
    two hash shuffles on scene, kernel bounded by per-scene box caps."""
    return (
        pred.groupBy("scene")
        .cogroup(gt.groupBy("scene"))
        .applyInPandas(
            _match_kernel,
            "scene bigint, n_pred bigint, n_gt bigint, n_tp bigint,"
            " tp_pred_sum bigint, tp_gt_sum bigint",
        )
    )


def _match_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    pred = _np_boxes(np.arange(_FP_N))
    gt = _np_gt(np.arange(_GT_N))
    rows = []
    for scene in range(N_SCENES):
        pm = pred["scene"] == scene
        gm = gt["scene"] == scene
        tp_p, tp_g = greedy_match_np(
            {c: v[pm] for c, v in pred.items()},
            {c: v[gm] for c, v in gt.items()},
        )
        rows.append(
            (scene, int(pm.sum()), int(gm.sum()), len(tp_p),
             sum(tp_p), sum(tp_g))
        )
    return _values_sql(
        [("scene", "BIGINT"), ("n_pred", "BIGINT"), ("n_gt", "BIGINT"),
         ("n_tp", "BIGINT"), ("tp_pred_sum", "BIGINT"), ("tp_gt_sum", "BIGINT")],
        rows,
    )


@register("box_match_fp", _match_fp_oracle)
def box_match_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCO-style greedy matching of the 4000-prediction fixture against
    2000 jittered ground-truth twins; per-scene tp counts + matched-id
    sums hash-checked against the pure-NumPy greedy replay."""
    pred = boxes_from_ids(
        fixture_range(spark, _FP_N).select(F.col("id").alias("event_id"))
    )
    gt = gt_from_ids(fixture_range(spark, _GT_N).select(F.col("id").alias("gt_id")))
    return match_stats(pred, gt)


# ---------------------------------------------------------------------------
# distributed average precision (no global sort)
# ---------------------------------------------------------------------------


def match_flags(pred: DataFrame, gt: DataFrame) -> DataFrame:
    """(scene, box_id, score, matched) per prediction — the per-pred view
    of the greedy matching (same kernel, flags instead of sums)."""

    def kernel(key, pdf_pred: pd.DataFrame, pdf_gt: pd.DataFrame) -> pd.DataFrame:
        p = {c: pdf_pred[c].to_numpy(dtype=np.int64) for c in pdf_pred.columns}
        g = {c: pdf_gt[c].to_numpy(dtype=np.int64) for c in pdf_gt.columns}
        tp_p, _ = greedy_match_np(p, g) if len(pdf_gt) else ([], [])
        tp = set(tp_p)
        return pd.DataFrame(
            {
                "scene": pdf_pred["scene"],
                "box_id": pdf_pred["box_id"],
                "score": pdf_pred["score"],
                "matched": [int(i) in tp for i in pdf_pred["box_id"]],
            }
        )

    return (
        pred.groupBy("scene")
        .cogroup(gt.groupBy("scene"))
        .applyInPandas(
            kernel, "scene bigint, box_id bigint, score bigint, matched boolean"
        )
    )


def ap_stats(pred: DataFrame, gt: DataFrame, micro: int = 1_000_000) -> DataFrame:
    """One-row exact AP fingerprint WITHOUT a global sort: the PR rank of
    a prediction under (score desc, id asc) is
    ``(# preds with higher score) + (# same-score preds with lower id) + 1``
    — the first term comes from a cumulative histogram over the bounded
    integer score domain (<= 1000 rows, broadcast back), the second from
    a window partitioned BY SCORE (partition size n/|scores|, never the
    corpus).  ``ap_microsum = sum over TPs of floor(micro*cum_tp/rank)``;
    AP = ap_microsum / (micro * n_gt)."""
    from pyspark.sql import Window

    # the flags table feeds the score histogram AND the rank join;
    # uncheckpointed, the cogrouped greedy matching (box generation +
    # cogroup shuffle + Python kernel) would execute once per branch
    flags = match_flags(pred, gt).localCheckpoint(eager=False)
    hist = flags.groupBy("score").agg(
        F.count("*").alias("n_s"),
        F.sum(F.col("matched").cast("long")).alias("m_s"),
    )
    # bounded-domain cumulative: <= 1000 rows in one partition — by design
    wh = (
        Window.orderBy(F.col("score").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = hist.select(
        "score",
        F.coalesce(F.sum("n_s").over(wh), F.lit(0)).alias("n_above"),
        F.coalesce(F.sum("m_s").over(wh), F.lit(0)).alias("m_above"),
    )
    ws = Window.partitionBy("score").orderBy("box_id")
    j = (
        flags.join(F.broadcast(hist), "score")
        .select(
            "matched",
            (F.col("n_above") + F.row_number().over(ws)).alias("rank"),
            (
                F.col("m_above")
                + F.sum(F.col("matched").cast("long")).over(
                    ws.rowsBetween(Window.unboundedPreceding, 0)
                )
            ).alias("cum_tp"),
        )
    )
    n_gt = gt.count()
    return (
        j.agg(
            F.count("*").alias("n_pred"),
            F.lit(n_gt).alias("n_gt"),
            F.sum(F.col("matched").cast("long")).alias("n_tp"),
            F.sum(F.when(F.col("matched"), F.col("rank"))).alias("rank_sum"),
            F.sum(F.when(F.col("matched"), F.col("cum_tp"))).alias("cumtp_sum"),
            F.sum(
                F.when(
                    F.col("matched"),
                    # SQL integer `div`: exact floor quotient on longs
                    F.expr(f"(cum_tp * {micro}) div rank"),
                )
            ).alias("ap_microsum"),
        )
    )


def _ap_replay(micro: int = 1_000_000):
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
    order = np.lexsort((pred["box_id"], -pred["score"]))
    m = matched[order]
    rank = np.arange(1, _FP_N + 1, dtype=np.int64)
    cum_tp = np.cumsum(m.astype(np.int64))
    return (
        _FP_N,
        _GT_N,
        int(m.sum()),
        int(rank[m].sum()),
        int(cum_tp[m].sum()),
        int((cum_tp[m] * micro // rank[m]).sum()),
    )


def _ap_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [("n_pred", "BIGINT"), ("n_gt", "BIGINT"), ("n_tp", "BIGINT"),
         ("rank_sum", "BIGINT"), ("cumtp_sum", "BIGINT"),
         ("ap_microsum", "BIGINT")],
        [_ap_replay()],
    )


@register("box_ap_fp", _ap_fp_oracle)
def box_ap_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus AP over the matching fixture, computed without a
    global sort (bounded-score-domain rank decomposition); hash-checked
    against the sequential lexsort replay."""
    pred = boxes_from_ids(
        fixture_range(spark, _FP_N).select(F.col("id").alias("event_id"))
    )
    gt = gt_from_ids(fixture_range(spark, _GT_N).select(F.col("id").alias("gt_id")))
    return ap_stats(pred, gt)
