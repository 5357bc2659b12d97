"""Instance-mask curation: RLE, exact mask IoU, WBF, panoptic quality.

The driver oracle replays share the column-interval kernel with the
engine, so these tests pin that kernel against per-pixel brute force it
does NOT share, plus planted semantic cases and plan shape.
"""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.boxes import _np_boxes, boxes_from_ids
from data_model_spark.operators.masks import (
    box_fusion,
    ellipse_mask,
    gt_seeds,
    mask_area,
    mask_iou_pairs,
    mask_pair_inter,
    mask_rle_scene_stats,
    mask_rle_stats,
    pred_seeds,
    rle_decode,
    rle_encode,
    voronoi_labels,
    wbf_np,
)


def test_ellipse_interval_matches_per_pixel_brute_force():
    """Column-interval bounds == the raw inequality at every pixel, and
    the RLE round-trips, across degenerate through max-size boxes."""
    for x0, y0, x1, y1 in [
        (0, 0, 4, 4), (3, 7, 10, 19), (100, 200, 421, 521),
        (0, 0, 65, 321), (5, 5, 6, 6), (5, 5, 7, 8), (703, 703, 1024, 1024),
    ]:
        w, h = x1 - x0, y1 - y0
        px, py = np.meshgrid(
            np.arange(x0, x1), np.arange(y0, y1), indexing="ij"
        )
        X, Y = 2 * px + 1 - (x0 + x1), 2 * py + 1 - (y0 + y1)
        brute = (X * X * h * h + Y * Y * w * w) <= w * w * h * h
        fast = ellipse_mask(x0, y0, x1, y1)
        assert (brute == fast).all()
        area, n_runs, fp = mask_rle_stats(x0, y0, x1, y1)
        assert area == int(brute.sum()) == mask_area(x0, y0, x1, y1)
        runs = rle_encode(fast.ravel())
        assert n_runs == runs.size and fp == int(
            (np.arange(1, runs.size + 1) * runs).sum()
        )
        assert (rle_decode(runs, fast.size) == fast.ravel()).all()


def test_pair_intersection_matches_canvas_brute_force():
    """Interval-overlap counting == dense canvas AND over the fixture's
    overlapping pairs (1000 boxes -> 5 per scene, real overlaps)."""
    b = _np_boxes(np.arange(1000))
    checked = 0
    for scene in range(80):  # subset keeps the dense path fast
        idx = np.flatnonzero(b["scene"] == scene)
        for i in idx:
            for j in idx:
                if b["box_id"][i] >= b["box_id"][j]:
                    continue
                ai = {k: int(v[i]) for k, v in b.items()}
                bj = {k: int(v[j]) for k, v in b.items()}
                iw = min(ai["x1"], bj["x1"]) - max(ai["x0"], bj["x0"])
                ih = min(ai["y1"], bj["y1"]) - max(ai["y0"], bj["y0"])
                if iw <= 0 or ih <= 0:
                    continue
                A = np.zeros((1024, 1024), bool)
                A[ai["x0"]:ai["x1"], ai["y0"]:ai["y1"]] = ellipse_mask(
                    ai["x0"], ai["y0"], ai["x1"], ai["y1"]
                )
                B = np.zeros((1024, 1024), bool)
                B[bj["x0"]:bj["x1"], bj["y0"]:bj["y1"]] = ellipse_mask(
                    bj["x0"], bj["y0"], bj["x1"], bj["y1"]
                )
                assert mask_pair_inter(ai, bj) == int((A & B).sum())
                checked += 1
    assert checked >= 50  # non-vacuous


def test_identical_twin_boxes_have_mask_iou_one(spark):
    """Planted exact-duplicate boxes (same coords, different ids):
    exactly one pair, with mask IoU exactly 1 (m_inter == m_uni)."""
    b = boxes_from_ids(spark.createDataFrame([(13,)], "event_id long"))
    twin = b.select(
        (F.col("box_id") + 1_000_000).alias("box_id"), "scene",
        "x0", "y0", "x1", "y1", "area", "score",
    )
    pairs = mask_iou_pairs(b.unionByName(twin)).collect()
    assert len(pairs) == 1
    assert pairs[0].m_inter == pairs[0].m_uni > 0
    box = {k: int(getattr(b.first(), k)) for k in ("x0", "y0", "x1", "y1")}
    assert pairs[0].m_inter == mask_area(**box)


def test_spark_mask_pairs_equal_brute_replay(spark):
    """Bucketed candidates + Arrow refine == brute-force replay at a
    size DIFFERENT from the oracle fixture (distribution-independence)."""
    n = 1500
    ids = spark.range(n).select(F.col("id").alias("event_id"))
    got = {
        (r.scene, r.a_id, r.b_id, r.m_inter, r.m_uni)
        for r in mask_iou_pairs(boxes_from_ids(ids)).collect()
    }
    b = _np_boxes(np.arange(n))
    want = set()
    for scene in np.unique(b["scene"]):
        idx = np.flatnonzero(b["scene"] == scene)
        for i in idx:
            for j in idx:
                if b["box_id"][i] >= b["box_id"][j]:
                    continue
                ai = {k: int(v[i]) for k, v in b.items()}
                bj = {k: int(v[j]) for k, v in b.items()}
                iw = min(ai["x1"], bj["x1"]) - max(ai["x0"], bj["x0"])
                ih = min(ai["y1"], bj["y1"]) - max(ai["y0"], bj["y0"])
                if iw <= 0 or ih <= 0:
                    continue
                mi = mask_pair_inter(ai, bj)
                mu = (
                    mask_area(ai["x0"], ai["y0"], ai["x1"], ai["y1"])
                    + mask_area(bj["x0"], bj["y0"], bj["x1"], bj["y1"])
                    - mi
                )
                if 2 * mi >= mu:
                    want.add(
                        (int(scene), int(b["box_id"][i]),
                         int(b["box_id"][j]), mi, mu)
                    )
    assert got == want
    assert len(want) >= 20  # non-vacuous


def test_mask_pairs_plan_has_no_cartesian(spark):
    ids = spark.range(100).select(F.col("id").alias("event_id"))
    plan = mask_iou_pairs(boxes_from_ids(ids))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_rle_scene_stats_spark_equals_replay(spark):
    n = 800
    ids = spark.range(n).select(F.col("id").alias("event_id"))
    got = {
        (r.scene, r.n_boxes, r.area_sum, r.runs_sum, r.fp_sum)
        for r in mask_rle_scene_stats(boxes_from_ids(ids)).collect()
    }
    b = _np_boxes(np.arange(n))
    agg = {}
    for i in range(n):
        area, nrun, fp = mask_rle_stats(
            int(b["x0"][i]), int(b["y0"][i]), int(b["x1"][i]), int(b["y1"][i])
        )
        row = agg.setdefault(int(b["scene"][i]), [0, 0, 0, 0])
        row[0] += 1
        row[1] += area
        row[2] += nrun
        row[3] += fp
    assert got == {(s, *v) for s, v in agg.items()}


def test_wbf_planted_chain_is_seed_anchored():
    """A (score 9) founds; B (7, IoU(A,B) = 0.667 >= 0.55) joins A's
    cluster; C (5) overlaps B at IoU 0.6 but seed A only at 0.379 -> C
    founds its own cluster (seed-anchored, not transitive-chain)."""
    ids = np.array([0, 1, 2], dtype=np.int64)
    x0 = np.array([0, 20, 45], dtype=np.int64)
    x1 = np.array([100, 120, 145], dtype=np.int64)
    y0 = np.zeros(3, dtype=np.int64)
    y1 = np.full(3, 100, dtype=np.int64)
    score = np.array([9, 7, 5], dtype=np.int64)
    cl = wbf_np(ids, x0, y0, x1, y1, score)
    assert [c["n_members"] for c in cl] == [2, 1]
    assert cl[0]["seed_id"] == 0 and cl[1]["seed_id"] == 2
    # fused coords: floor-weighted mean with wt = score + 1
    assert cl[0]["fx0"] == (10 * 0 + 8 * 20) // 18
    assert cl[0]["fx1"] == (10 * 100 + 8 * 120) // 18


def test_wbf_zero_score_singleton_is_defined():
    cl = wbf_np(
        np.array([0], dtype=np.int64), np.array([5], dtype=np.int64),
        np.array([5], dtype=np.int64), np.array([50], dtype=np.int64),
        np.array([60], dtype=np.int64), np.array([0], dtype=np.int64),
    )
    assert cl[0]["fx0"] == 5 and cl[0]["fx1"] == 50  # wt = 1, no div-0


def test_wbf_spark_equals_replay(spark):
    n = 600
    ids = spark.range(n).select(F.col("id").alias("event_id"))
    got = {tuple(r) for r in box_fusion(boxes_from_ids(ids)).collect()}
    b = _np_boxes(np.arange(n))
    want = set()
    for scene in range(200):
        m = b["scene"] == scene
        cl = wbf_np(
            b["box_id"][m], b["x0"][m], b["y0"][m],
            b["x1"][m], b["y1"][m], b["score"][m],
        )
        want.add(
            (scene, len(cl),
             sum(c["n_members"] ** 2 for c in cl),
             sum(c["seed_id"] for c in cl),
             sum(c["fx0"] for c in cl), sum(c["fy0"] for c in cl),
             sum(c["fx1"] for c in cl), sum(c["fy1"] for c in cl))
        )
    assert got == want


def test_voronoi_tie_breaks_to_lowest_seed_id():
    seeds = np.array([[0, 0], [10, 0]], dtype=np.int64)
    lab = voronoi_labels(
        np.array([5], dtype=np.int64), np.array([0], dtype=np.int64), seeds
    )
    assert lab[0] == 0  # equidistant -> first (lowest) seed


def test_pq_identical_segmentations_score_one():
    """PQ of a segmentation against itself: every segment matches at
    IoU 1, so pq_microsum == n_segments * 1e6 exactly."""
    xs = np.arange(128, dtype=np.int64)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    lab = voronoi_labels(gx, gy, pred_seeds()).ravel()
    n = len(np.unique(lab))
    joint = np.zeros((17, 17), dtype=np.int64)
    for a, c in zip(*np.unique(lab, return_counts=True)):
        joint[a, a] = c
    sa = joint.sum(1)
    pq = sum(
        int(joint[i, i]) * 1_000_000 // int(sa[i])
        for i in range(17) if joint[i, i]
    )
    assert pq == n * 1_000_000


def test_pq_fixture_is_non_vacuous():
    """The 17-vs-13 fixture has real matches AND real FPs/FNs."""
    from data_model_spark.operators.masks import _pq_replay

    n_pred, n_gt, n_tp, inter_sum, pq_sum = _pq_replay()
    assert n_pred == 17 and n_gt == 13
    assert 0 < n_tp < n_gt  # matches exist; so do false negatives
    assert 0 < pq_sum < n_tp * 1_000_000  # no match is pixel-perfect


def test_gt_seeds_differ_from_pred_seeds():
    assert not np.array_equal(pred_seeds()[:13], gt_seeds())


def test_vectorized_area_equals_scalar_mask_area():
    """ellipse_areas_wh (the vectorized unique-(w,h) path of the pair
    kernel) == scalar mask_area at arbitrary translations, including
    degenerate 1-px sizes."""
    from data_model_spark.operators.masks import ellipse_areas_wh

    rng = np.random.default_rng(7)
    w = rng.integers(1, 321, 200).astype(np.int64)
    h = rng.integers(1, 321, 200).astype(np.int64)
    w[:3], h[:3] = [1, 1, 320], [1, 320, 1]
    x0 = rng.integers(0, 5000, 200).astype(np.int64)
    y0 = rng.integers(0, 5000, 200).astype(np.int64)
    got = ellipse_areas_wh(w, h)
    for i in range(200):
        assert got[i] == mask_area(
            int(x0[i]), int(y0[i]), int(x0[i] + w[i]), int(y0[i] + h[i])
        )


def test_pair_kernel_zero_overlap_width_rows():
    """Rows whose boxes only touch (zero intersection width) flow through
    the ragged expansion as empty segments: inter 0, union = area sum."""
    import pandas as pd

    from data_model_spark.operators.masks import _pair_kernel

    pdf = pd.DataFrame(
        {
            "scene": [0, 0],
            "a_id": [1, 3],
            "b_id": [2, 4],
            "ax0": [0, 0], "ay0": [0, 0], "ax1": [10, 10], "ay1": [10, 10],
            "bx0": [10, 5], "by0": [0, 5], "bx1": [20, 15], "by1": [10, 15],
        }
    )
    out = next(_pair_kernel(iter([pdf])))
    a = mask_area(0, 0, 10, 10)
    assert out.m_inter[0] == 0 and out.m_uni[0] == 2 * a
    assert out.m_inter[1] == mask_pair_inter(
        {"x0": 0, "y0": 0, "x1": 10, "y1": 10},
        {"x0": 5, "y0": 5, "x1": 15, "y1": 15},
    )
