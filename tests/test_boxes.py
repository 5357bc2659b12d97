"""Detection-box curation: bucketed IoU join, suppression, greedy NMS."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from data_model_spark.operators.boxes import (
    _FP_N,
    _np_boxes,
    boxes_from_ids,
    greedy_match_np,
    greedy_nms,
    greedy_nms_np,
    iou_pairs,
    suppress_keep,
)


def _naive_pairs(b, iou_num, iou_den):
    """Per-scene theta self-join replay in NumPy (reference)."""
    out = set()
    for scene in np.unique(b["scene"]):
        m = np.where(b["scene"] == scene)[0]
        for i in m:
            for j in m:
                if b["box_id"][i] >= b["box_id"][j]:
                    continue
                iw = min(b["x1"][i], b["x1"][j]) - max(b["x0"][i], b["x0"][j])
                ih = min(b["y1"][i], b["y1"][j]) - max(b["y0"][i], b["y0"][j])
                if iw <= 0 or ih <= 0:
                    continue
                inter = iw * ih
                uni = b["area"][i] + b["area"][j] - inter
                if iou_den * inter >= iou_num * uni:
                    out.add(
                        (int(scene), int(b["box_id"][i]), int(b["box_id"][j]),
                         int(inter), int(uni))
                    )
    return out


def test_bucketed_pairs_match_naive(spark):
    """2D bucket cover + owner-cell rule == the direct theta join."""
    ids = spark.range(2000).select(F.col("id").alias("event_id"))
    got = {
        (r.scene, r.a_id, r.b_id, r.inter, r.uni)
        for r in iou_pairs(boxes_from_ids(ids)).collect()
    }
    want = _naive_pairs(_np_boxes(np.arange(2000)), 3, 10)
    assert got == want
    assert len(want) == 702  # non-vacuous at this density


def test_greedy_nms_planted_scene():
    """Hand-built scene: A(score 9) kills B; B would have killed C, but
    greedy lets the suppressed B kill nobody, so C survives; D is far."""
    x0 = np.array([0, 10, 40, 500])
    y0 = np.array([0, 0, 0, 500])
    x1 = np.array([100, 110, 140, 600])
    y1 = np.array([100, 100, 100, 600])
    score = np.array([9, 8, 7, 1])
    ids = np.arange(4)
    kept = greedy_nms_np(ids, x0, y0, x1, y1, score)
    assert kept.tolist() == [0, 2, 3]


def test_greedy_keeps_superset_of_one_pass(spark):
    """Every one-pass survivor has no higher overlapping box at all, so
    greedy (which only lets KEPT boxes kill) must keep it too."""
    ids = spark.range(_FP_N).select(F.col("id").alias("event_id"))
    boxes = boxes_from_ids(ids)
    one_pass = {r.box_id for r in suppress_keep(boxes).collect()}
    greedy = {r.box_id for r in greedy_nms(boxes).collect()}
    assert one_pass <= greedy
    assert len(one_pass) == 3604  # pinned: no chains on the hash fixture


def test_chain_scene_splits_the_two_policies(spark):
    """Planted A>B>C chain through BOTH full Spark paths: one-pass kills
    B and C (each has a higher overlapping box); greedy revives C
    because its only killer B was itself suppressed by A."""
    rows = [
        # (box_id, scene, x0, y0, x1, y1, score)
        (0, 0, 0, 0, 100, 100, 9),     # A
        (1, 0, 10, 0, 110, 100, 8),    # B: IoU(A,B)=9000/11000 >= .5
        (2, 0, 40, 0, 140, 100, 7),    # C: IoU(B,C)=7000/13000 >= .5,
        #                                IoU(A,C)=6000/14000 < .5
        (3, 0, 500, 500, 600, 600, 1),  # D: isolated
    ]
    boxes = spark.createDataFrame(
        [(i, s, a, b, c, d, (c - a) * (d - b), sc)
         for i, s, a, b, c, d, sc in rows],
        "box_id long, scene long, x0 long, y0 long, x1 long, y1 long,"
        " area long, score long",
    )
    one_pass = {r.box_id for r in suppress_keep(boxes).collect()}
    greedy = {r.box_id for r in greedy_nms(boxes).collect()}
    assert one_pass == {0, 3}
    assert greedy == {0, 2, 3}


def test_nms_kernel_matches_replay(spark):
    """applyInPandas kernel == pure-NumPy greedy replay, every scene."""
    ids = spark.range(1000).select(F.col("id").alias("event_id"))
    got = (
        greedy_nms(boxes_from_ids(ids))
        .orderBy("scene", "box_id")
        .toPandas()
    )
    b = _np_boxes(np.arange(1000))
    rows = []
    for scene in range(200):
        m = b["scene"] == scene
        kept = greedy_nms_np(
            b["box_id"][m], b["x0"][m], b["y0"][m],
            b["x1"][m], b["y1"][m], b["score"][m],
        )
        rows += [(scene, int(i), int((i * 91) % 1000))
                 for i in sorted(b["box_id"][m][kept].tolist())]
    want = pd.DataFrame(rows, columns=["scene", "box_id", "score"])
    assert got.reset_index(drop=True).equals(want)


def test_tie_break_is_deterministic():
    """Equal scores: lower id wins (both replay and kernel lexsort)."""
    x0 = np.array([0, 5])
    y0 = np.array([0, 0])
    x1 = np.array([100, 105])
    y1 = np.array([100, 100])
    kept = greedy_nms_np(
        np.array([7, 3]), x0, y0, x1, y1, np.array([5, 5])
    )
    assert kept.tolist() == [1]  # id 3 visited first, suppresses id 7


def test_pairs_plan_has_no_cartesian(spark):
    ids = spark.range(100).select(F.col("id").alias("event_id"))
    plan = iou_pairs(boxes_from_ids(ids))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_greedy_match_planted_contention():
    """Two predictions contend for one gt: the higher-scored pred takes
    it (greedy order), the other goes unmatched even though it overlaps."""
    pred = {
        "box_id": np.array([0, 1]),
        "x0": np.array([0, 4]), "y0": np.array([0, 0]),
        "x1": np.array([100, 104]), "y1": np.array([100, 100]),
        "score": np.array([5, 9]),
    }
    gt = {
        "gt_id": np.array([7]),
        "x0": np.array([2]), "y0": np.array([0]),
        "x1": np.array([102]), "y1": np.array([100]),
    }
    tp_p, tp_g = greedy_match_np(pred, gt)
    assert (tp_p, tp_g) == ([1], [7])


def test_greedy_match_prefers_higher_iou():
    """One prediction, two overlapping gts: the exact cross-multiplied
    argmax picks the higher-IoU gt, not the lower-id one."""
    pred = {
        "box_id": np.array([0]),
        "x0": np.array([0]), "y0": np.array([0]),
        "x1": np.array([100]), "y1": np.array([100]),
        "score": np.array([5]),
    }
    gt = {
        "gt_id": np.array([1, 2]),
        "x0": np.array([40, 5]), "y0": np.array([0, 0]),
        "x1": np.array([140, 105]), "y1": np.array([100, 100]),
    }
    tp_p, tp_g = greedy_match_np(pred, gt, iou_num=3, iou_den=10)
    assert (tp_p, tp_g) == ([0], [2])


def test_match_stats_spark_equals_replay(spark):
    """Cogrouped kernel == per-scene NumPy replay, all 200 scenes; the
    fixture has real false negatives (1794 of 2000 gts matched)."""
    from data_model_spark.operators.boxes import (
        _GT_N,
        _np_gt,
        box_match_fp,
        greedy_match_np,
    )

    got = box_match_fp(spark, "").orderBy("scene").toPandas()
    pred = _np_boxes(np.arange(_FP_N))
    gt = _np_gt(np.arange(_GT_N))
    rows = []
    for scene in range(200):
        pm, gm = pred["scene"] == scene, gt["scene"] == scene
        tp_p, tp_g = greedy_match_np(
            {c: v[pm] for c, v in pred.items()},
            {c: v[gm] for c, v in gt.items()},
        )
        rows.append((scene, int(pm.sum()), int(gm.sum()), len(tp_p),
                     sum(tp_p), sum(tp_g)))
    want = pd.DataFrame(rows, columns=list(got.columns))
    assert got.reset_index(drop=True).equals(want)
    assert want["n_tp"].sum() == 1794  # non-vacuous: misses exist


def test_pairs_invariant_to_cell_pitch(spark, monkeypatch):
    """The owner-cell emit rule makes the result independent of the
    candidate-grid pitch (perf knob only): identical pair sets at 256
    and 128 px cells, including boxes spanning 2x2 vs 3x3+ cells."""
    from data_model_spark.operators import boxes as B

    ids = spark.range(1500).select(F.col("id").alias("event_id"))
    df = boxes_from_ids(ids)
    at256 = {(r.a_id, r.b_id) for r in iou_pairs(df).collect()}
    monkeypatch.setattr(B, "CELL", 128)
    at128 = {(r.a_id, r.b_id) for r in iou_pairs(df).collect()}
    assert at256 == at128 and len(at256) > 0


def test_ap_replay_sanity_and_values():
    """Replay AP fingerprint: recall 1794/2000, AP strictly inside (0,1),
    and the exact integer identities hold."""
    from data_model_spark.operators.boxes import _GT_N, _ap_replay

    n_pred, n_gt, n_tp, rank_sum, cumtp_sum, ap_micro = _ap_replay()
    assert (n_pred, n_gt, n_tp) == (4000, _GT_N, 1794)
    assert 0 < ap_micro < 10**6 * n_gt  # 0 < AP < 1
    assert rank_sum >= cumtp_sum  # cum_tp <= rank at every position


def test_ap_spark_single_partition_only_for_histogram(spark):
    """The AP plan's only single-partition exchange is the <=1000-row
    score histogram cumsum — the corpus itself is never globally
    sorted."""
    from data_model_spark.operators.boxes import box_ap_fp

    df = box_ap_fp(spark, "")
    row = df.collect()[0]
    assert row.n_tp == 1794
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus-side rank window is partitioned BY SCORE (hash), never
    # globally sorted; single-partition exchanges exist only for the
    # <=1000-row histogram cumsum and the 1-row final aggregate
    assert "hashpartitioning(score" in plan
    half = plan.count("Exchange SinglePartition")
    assert half <= 4  # (hist + final agg) x (AQE initial + final render)
