"""Instance-mask curation: RLE encoding, exact mask IoU, weighted box
fusion, and panoptic quality.

The detection-box wave (``boxes.py``) curates rectangle labels; a real
segmentation corpus labels *masks*.  This wave extends the same exact
integer discipline to pixel masks — every operator is bit-replayable in
NumPy and (through VALUES literals) in DuckDB:

* ``mask_rle_fp`` — COCO-style column-major run-length encoding of each
  instance mask (pycocotools' public ``frPyObjects`` convention: counts
  alternate 0s/1s starting with the leading-zero count).  The kernel is
  one ``mapInPandas`` over the box stream — encoding is per-row work, so
  NOTHING shuffles except the final per-scene fingerprint aggregate.
* ``mask_iou_pairs_fp`` — exact pixel mask-IoU pairs.  Candidates come
  from the bucketed box-overlap join (``boxes.iou_pairs`` at threshold
  0): masks are inscribed in their boxes, so mask-intersecting pairs are
  a PROVABLE subset of box-overlapping pairs — candidate completeness is
  a theorem, not a recall target.  The refine step never materializes a
  mask: each ellipse's column cross-section is an integer interval
  ``[lo, hi]`` (computed by exact isqrt), so the pair intersection is a
  sum of interval overlaps — O(box width) per pair, not O(area).
* ``box_fusion_fp`` — deterministic Weighted Box Fusion (Solovyev et
  al. 2021, seed-anchored variant): boxes visit by (score desc, id
  asc), join the FIRST cluster (creation order) whose seed box overlaps
  at IoU >= 0.55 (exact ``20*inter >= 11*union`` cross-multiplication),
  and each cluster fuses to the weight-floor mean ``sum(wt*coord) div
  sum(wt)`` with ``wt = score + 1`` (the +1 keeps zero-score singletons
  well-defined).  Seed-anchored (vs running-mean) keeps every IoU test
  integer-exact; scenes are independent ``applyInPandas`` groups.
* ``panoptic_pq_fp`` — panoptic quality (Kirillov et al., CVPR 2019)
  between two Voronoi segmentations of a 1024^2 canvas (17 "predicted"
  vs 13 "ground-truth" seeds, nearest-seed by exact squared distance,
  ties to the lowest seed id).  The 100 TB shape: each 256^2 tile emits
  only its joint label histogram (<= 17*13 rows), per-pixel labels NEVER
  leave the executor; segment areas are the histogram marginals, the
  IoU > 0.5 matching is unique by the PQ theorem (a segment pair with
  IoU > 0.5 claims more than half of each side), and
  ``pq_microsum = sum floor(1e6 * inter / union)`` over matches is an
  exact integer.

Fixture: the fixed 4000-box detection fixture (``boxes._np_boxes``,
sf-independent) with the inscribed-ellipse mask
``(2px+1-(x0+x1))^2 h^2 + (2py+1-(y0+y1))^2 w^2 <= w^2 h^2`` — the test
at DOUBLED pixel-center coordinates keeps everything int64 (max term
~321^4 ~ 1.1e10).  One shared NumPy kernel (``ellipse_col_bounds``)
backs the Spark kernels AND the sequential replays, so the driver hash
match proves the distributed plumbing (bucketed candidates, Arrow
batching, shuffle aggregation), while pytest pins the kernel against
brute-force per-pixel evaluation it does NOT share.

Reference context: the reference handles masks only as downsampled
quality rasters (``s2_optimization/s2_resampling.py:119-153``); the
instance-mask layer extends its tile-grid geometry
(``conversion/utils.py:161-189``) to the label-curation operations a
10^12-image segmentation corpus needs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .boxes import _FP_N, N_SCENES, _np_boxes, boxes_from_ids, iou_pairs
from ..sources.tables import fixture_range
from .registry import register

# ---------------------------------------------------------------------------
# shared exact-integer ellipse kernels (Spark executors + replay)
# ---------------------------------------------------------------------------


def _visqrt(v: np.ndarray) -> np.ndarray:
    """Exact vectorized integer sqrt for v < 2^52 (one float64 sqrt plus
    a +/-1 correction — float error is < 1 ulp in this range)."""
    s = np.sqrt(v.astype(np.float64)).astype(np.int64)
    s = np.where((s + 1) * (s + 1) <= v, s + 1, s)
    return np.where(s * s > v, s - 1, s)


def ellipse_col_bounds(x0, y0, x1, y1, px):
    """Inclusive py interval [lo, hi] of in-ellipse pixels in column px
    of box (x0,y0,x1,y1); empty iff hi < lo.  All int64, broadcastable.

    Inside test at doubled centers: X = 2*px+1-(x0+x1),
    Y = 2*py+1-(y0+y1), inside iff X^2 h^2 + Y^2 w^2 <= w^2 h^2, i.e.
    Y^2 <= floor((w^2 h^2 - X^2 h^2) / w^2) — exact because Y^2 is an
    integer — so |Y| <= isqrt(...) and the py range follows.
    """
    w, h = x1 - x0, y1 - y0
    X = 2 * px + 1 - (x0 + x1)
    R = (w * w - X * X) * (h * h)
    B = _visqrt(np.maximum(R, 0) // (w * w))
    cy2 = y0 + y1
    lo = -((B + 1 - cy2) // 2)  # ceil((cy2 - 1 - B) / 2)
    hi = (cy2 - 1 + B) // 2
    return lo, hi


def ellipse_mask(x0: int, y0: int, x1: int, y1: int) -> np.ndarray:
    """Dense (w, h) bool mask, row index = column offset px - x0 (so
    ``.ravel()`` IS the COCO column-major flattening)."""
    px = np.arange(x0, x1, dtype=np.int64)
    lo, hi = ellipse_col_bounds(
        np.int64(x0), np.int64(y0), np.int64(x1), np.int64(y1), px
    )
    py = np.arange(y0, y1, dtype=np.int64)
    return (py[None, :] >= lo[:, None]) & (py[None, :] <= hi[:, None])


def rle_encode(flat: np.ndarray) -> np.ndarray:
    """COCO RLE counts of a flat 0/1 array: alternating run lengths
    starting with the leading-zero count (0 if the array starts with 1)."""
    n = flat.size
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    runs = np.diff(np.concatenate(([0], change, [n]))).astype(np.int64)
    if flat[0]:
        runs = np.concatenate(([np.int64(0)], runs))
    return runs


def rle_decode(runs: np.ndarray, n: int) -> np.ndarray:
    """Inverse of ``rle_encode`` (round-trip pinned in tests)."""
    flat = np.zeros(n, dtype=bool)
    pos, val = 0, False
    for r in runs:
        if val:
            flat[pos : pos + r] = True
        pos += int(r)
        val = not val
    return flat


def mask_rle_stats(x0: int, y0: int, x1: int, y1: int) -> tuple[int, int, int]:
    """(area, n_runs, rle_fp) of the box's inscribed-ellipse mask;
    rle_fp = sum over 1-indexed runs of i * run_i (position-weighted, so
    any permutation or off-by-one run boundary changes it)."""
    runs = rle_encode(ellipse_mask(x0, y0, x1, y1).ravel())
    i = np.arange(1, runs.size + 1, dtype=np.int64)
    area = int(runs[1::2].sum()) if runs.size else 0
    return area, int(runs.size), int((i * runs).sum())


def mask_pair_inter(a: dict, b: dict) -> int:
    """Exact pixel count of ellipse(a) & ellipse(b): per shared column
    the cross-sections are intervals, so the count is a sum of interval
    overlaps — O(intersection width), never O(area)."""
    cx0, cx1 = max(a["x0"], b["x0"]), min(a["x1"], b["x1"])
    if cx1 <= cx0:
        return 0
    px = np.arange(cx0, cx1, dtype=np.int64)
    alo, ahi = ellipse_col_bounds(a["x0"], a["y0"], a["x1"], a["y1"], px)
    blo, bhi = ellipse_col_bounds(b["x0"], b["y0"], b["x1"], b["y1"], px)
    ov = np.minimum(ahi, bhi) - np.maximum(alo, blo) + 1
    return int(np.maximum(ov, 0).sum())


def mask_area(x0: int, y0: int, x1: int, y1: int) -> int:
    px = np.arange(x0, x1, dtype=np.int64)
    lo, hi = ellipse_col_bounds(
        np.int64(x0), np.int64(y0), np.int64(x1), np.int64(y1), px
    )
    return int(np.maximum(hi - lo + 1, 0).sum())


# ---------------------------------------------------------------------------
# mask_rle_fp — per-scene RLE fingerprint aggregate
# ---------------------------------------------------------------------------

_RLE_SCHEMA = (
    "scene bigint, n_boxes bigint, area_sum bigint,"
    " runs_sum bigint, fp_sum bigint"
)


def _rle_kernel(batches):
    for pdf in batches:
        arr = {c: pdf[c].to_numpy(dtype=np.int64) for c in pdf.columns}
        area = np.empty(len(pdf), dtype=np.int64)
        nrun = np.empty(len(pdf), dtype=np.int64)
        fp = np.empty(len(pdf), dtype=np.int64)
        for i in range(len(pdf)):
            area[i], nrun[i], fp[i] = mask_rle_stats(
                arr["x0"][i], arr["y0"][i], arr["x1"][i], arr["y1"][i]
            )
        yield pd.DataFrame(
            {
                "scene": arr["scene"],
                "n_boxes": np.ones(len(pdf), dtype=np.int64),
                "area_sum": area,
                "runs_sum": nrun,
                "fp_sum": fp,
            }
        )


def mask_rle_scene_stats(boxes: DataFrame) -> DataFrame:
    """Per-scene sums of (mask area, run count, position-weighted run
    fingerprint).  Encoding is map-side (one Arrow pass over the box
    stream); only the 5-column per-box stats reach the scene shuffle."""
    per_box = boxes.select("scene", "x0", "y0", "x1", "y1").mapInPandas(
        _rle_kernel, _RLE_SCHEMA
    )
    return per_box.groupBy("scene").agg(
        F.sum("n_boxes").alias("n_boxes"),
        F.sum("area_sum").alias("area_sum"),
        F.sum("runs_sum").alias("runs_sum"),
        F.sum("fp_sum").alias("fp_sum"),
    )


def _rle_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    b = _np_boxes(np.arange(_FP_N))
    agg: dict[int, list[int]] = {}
    for i in range(_FP_N):
        area, nrun, fp = mask_rle_stats(
            int(b["x0"][i]), int(b["y0"][i]), int(b["x1"][i]), int(b["y1"][i])
        )
        row = agg.setdefault(int(b["scene"][i]), [0, 0, 0, 0])
        row[0] += 1
        row[1] += area
        row[2] += nrun
        row[3] += fp
    rows = [(s, *agg[s]) for s in sorted(agg)]
    return _values_sql(
        [("scene", "BIGINT"), ("n_boxes", "BIGINT"), ("area_sum", "BIGINT"),
         ("runs_sum", "BIGINT"), ("fp_sum", "BIGINT")],
        rows,
    )


@register("mask_rle_fp", _rle_fp_oracle)
def mask_rle_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCO column-major RLE of the 4000 inscribed-ellipse instance
    masks, fingerprinted per scene; hash-checked against the sequential
    replay (same kernel, distributed plumbing under test)."""
    ids = fixture_range(spark, _FP_N).select(F.col("id").alias("event_id"))
    return mask_rle_scene_stats(boxes_from_ids(ids))


# ---------------------------------------------------------------------------
# mask_iou_pairs_fp — exact mask IoU over bucketed box candidates
# ---------------------------------------------------------------------------

_PAIR_SCHEMA = (
    "scene bigint, a_id bigint, b_id bigint, m_inter bigint, m_uni bigint"
)


def _segment_sums(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Exact int64 per-segment sums of ``values`` split at cumulative
    ``bounds`` (len n+1); zero-width segments yield 0."""
    cs = np.concatenate(([np.int64(0)], np.cumsum(values, dtype=np.int64)))
    return cs[bounds[1:]] - cs[bounds[:-1]]


def ellipse_areas_wh(w: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Vectorized exact ellipse pixel counts for boxes of sizes (w, h).
    The doubled-center inside test is translation-invariant (cy2 parity
    equals h parity), so the area depends only on (w, h) — pinned
    against per-box ``mask_area`` in tests."""
    w = w.astype(np.int64)
    h = h.astype(np.int64)
    bounds = np.concatenate(([np.int64(0)], np.cumsum(w, dtype=np.int64)))
    idx = np.repeat(np.arange(len(w), dtype=np.int64), w)
    px = np.arange(bounds[-1], dtype=np.int64) - bounds[idx]
    lo, hi = ellipse_col_bounds(
        np.int64(0), np.int64(0), w[idx], h[idx], px
    )
    return _segment_sums(np.maximum(hi - lo + 1, 0), bounds)


def _pair_kernel(batches):
    """Vectorized across pairs: intersections via a ragged per-column
    expansion (flat size = sum of per-pair overlap widths), areas via
    unique (w, h) lookup — no per-pair Python loop.  Identical integer
    arithmetic to ``mask_pair_inter``/``mask_area`` (the replay oracle
    still uses the scalar forms, so the driver hash match pins the
    vectorization)."""
    for pdf in batches:
        arr = {c: pdf[c].to_numpy(dtype=np.int64) for c in pdf.columns}
        n = len(pdf)
        ax0, ay0, ax1, ay1 = (arr["ax0"], arr["ay0"], arr["ax1"], arr["ay1"])
        bx0, by0, bx1, by1 = (arr["bx0"], arr["by0"], arr["bx1"], arr["by1"])

        cx0 = np.maximum(ax0, bx0)
        width = np.maximum(np.minimum(ax1, bx1) - cx0, 0)
        bounds = np.concatenate(
            ([np.int64(0)], np.cumsum(width, dtype=np.int64))
        )
        pidx = np.repeat(np.arange(n, dtype=np.int64), width)
        px = np.arange(bounds[-1], dtype=np.int64) - bounds[pidx] + cx0[pidx]
        alo, ahi = ellipse_col_bounds(
            ax0[pidx], ay0[pidx], ax1[pidx], ay1[pidx], px
        )
        blo, bhi = ellipse_col_bounds(
            bx0[pidx], by0[pidx], bx1[pidx], by1[pidx], px
        )
        ov = np.maximum(
            np.minimum(ahi, bhi) - np.maximum(alo, blo) + 1, 0
        )
        inter = _segment_sums(ov, bounds)

        # areas depend only on (w, h): one ragged pass over the UNIQUE
        # size combos (<= 2n, typically far fewer), then a gather
        wh_key = np.concatenate(
            ((ax1 - ax0) << 20 | (ay1 - ay0), (bx1 - bx0) << 20 | (by1 - by0))
        )
        uniq, inv = np.unique(wh_key, return_inverse=True)
        areas = ellipse_areas_wh(uniq >> 20, uniq & ((1 << 20) - 1))[inv]
        uni = areas[:n] + areas[n:] - inter

        yield pd.DataFrame(
            {
                "scene": arr["scene"],
                "a_id": arr["a_id"],
                "b_id": arr["b_id"],
                "m_inter": inter,
                "m_uni": uni,
            }
        )


def mask_iou_pairs(boxes: DataFrame, iou_num: int = 5, iou_den: int = 10) -> DataFrame:
    """Same-scene pairs with MASK IoU >= iou_num/iou_den.  Candidates =
    box-overlap pairs from the bucketed 2D cover join (threshold 0,
    ``with_coords`` carries the corners to the refine — no join back);
    masks are inscribed in their boxes, so this candidate set is
    complete by construction.  The refine counts interval overlaps per
    column of the box intersection."""
    cand = iou_pairs(boxes, iou_num=0, iou_den=10, with_coords=True).select(
        "scene", "a_id", "b_id",
        "ax0", "ay0", "ax1", "ay1", "bx0", "by0", "bx1", "by1",
    )
    refined = cand.mapInPandas(_pair_kernel, _PAIR_SCHEMA)
    return refined.filter(
        F.lit(iou_den) * F.col("m_inter") >= F.lit(iou_num) * F.col("m_uni")
    )


def _mask_pairs_replay() -> list[tuple]:
    b = _np_boxes(np.arange(_FP_N))
    rows = []
    for scene in range(N_SCENES):
        idx = np.flatnonzero(b["scene"] == scene)
        for i in idx:
            for j in idx:
                if b["box_id"][i] >= b["box_id"][j]:
                    continue
                iw = min(b["x1"][i], b["x1"][j]) - max(b["x0"][i], b["x0"][j])
                ih = min(b["y1"][i], b["y1"][j]) - max(b["y0"][i], b["y0"][j])
                if iw <= 0 or ih <= 0:
                    continue
                ai = {k: int(v[i]) for k, v in b.items()}
                bj = {k: int(v[j]) for k, v in b.items()}
                mi = mask_pair_inter(ai, bj)
                mu = (
                    mask_area(ai["x0"], ai["y0"], ai["x1"], ai["y1"])
                    + mask_area(bj["x0"], bj["y0"], bj["x1"], bj["y1"])
                    - mi
                )
                if 10 * mi >= 5 * mu:
                    rows.append(
                        (scene, int(b["box_id"][i]), int(b["box_id"][j]), mi, mu)
                    )
    return rows


def _mask_pairs_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [("scene", "BIGINT"), ("a_id", "BIGINT"), ("b_id", "BIGINT"),
         ("m_inter", "BIGINT"), ("m_uni", "BIGINT")],
        _mask_pairs_replay(),
    )


@register("mask_iou_pairs_fp", _mask_pairs_oracle)
def mask_iou_pairs_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact elliptical-mask IoU >= 0.5 pairs over the fixed fixture;
    the oracle is the brute-force all-overlapping-pairs replay, so a
    driver match proves bucketed-candidate completeness AND the
    interval-overlap counting."""
    ids = fixture_range(spark, _FP_N).select(F.col("id").alias("event_id"))
    return mask_iou_pairs(boxes_from_ids(ids))


# ---------------------------------------------------------------------------
# box_fusion_fp — deterministic seed-anchored Weighted Box Fusion
# ---------------------------------------------------------------------------


def wbf_np(
    ids: np.ndarray,
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    score: np.ndarray,
    iou_num: int = 11,
    iou_den: int = 20,
) -> list[dict]:
    """Seed-anchored WBF within one scene.  Visit by (score desc, id
    asc); a box joins the FIRST cluster (creation order) whose SEED box
    overlaps it at IoU >= iou_num/iou_den, else founds a new cluster.
    Fused coords = floor(sum(wt*coord) / sum(wt)), wt = score + 1."""
    order = np.lexsort((ids, -score.astype(np.int64)))
    area = (x1 - x0) * (y1 - y0)
    clusters: list[dict] = []
    for i in order:
        placed = False
        for c in clusters:
            s = c["seed"]
            iw = min(x1[i], x1[s]) - max(x0[i], x0[s])
            ih = min(y1[i], y1[s]) - max(y0[i], y0[s])
            inter = iw * ih
            if (
                iw > 0
                and ih > 0
                and iou_den * inter >= iou_num * (area[i] + area[s] - inter)
            ):
                c["members"].append(int(i))
                placed = True
                break
        if not placed:
            clusters.append({"seed": int(i), "members": [int(i)]})
    out = []
    for c in clusters:
        m = np.asarray(c["members"], dtype=np.int64)
        wt = score[m].astype(np.int64) + 1
        tw = int(wt.sum())
        out.append(
            {
                "seed_id": int(ids[c["seed"]]),
                "n_members": len(m),
                "fx0": int((wt * x0[m]).sum()) // tw,
                "fy0": int((wt * y0[m]).sum()) // tw,
                "fx1": int((wt * x1[m]).sum()) // tw,
                "fy1": int((wt * y1[m]).sum()) // tw,
            }
        )
    return out


_WBF_SCHEMA = (
    "scene bigint, n_clusters bigint, memsq_sum bigint, seedid_sum bigint,"
    " fx0_sum bigint, fy0_sum bigint, fx1_sum bigint, fy1_sum bigint"
)


def _wbf_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    arr = {c: pdf[c].to_numpy(dtype=np.int64) for c in pdf.columns}
    cl = wbf_np(
        arr["box_id"], arr["x0"], arr["y0"], arr["x1"], arr["y1"], arr["score"]
    )
    return pd.DataFrame(
        {
            "scene": [int(arr["scene"][0])],
            "n_clusters": [len(cl)],
            "memsq_sum": [sum(c["n_members"] ** 2 for c in cl)],
            "seedid_sum": [sum(c["seed_id"] for c in cl)],
            "fx0_sum": [sum(c["fx0"] for c in cl)],
            "fy0_sum": [sum(c["fy0"] for c in cl)],
            "fx1_sum": [sum(c["fx1"] for c in cl)],
            "fy1_sum": [sum(c["fy1"] for c in cl)],
        }
    )


def box_fusion(boxes: DataFrame) -> DataFrame:
    """Per-scene WBF cluster fingerprints: one hash shuffle on scene,
    kernel bounded by the per-scene detector output cap."""
    return boxes.groupBy("scene").applyInPandas(_wbf_kernel, _WBF_SCHEMA)


def _wbf_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    b = _np_boxes(np.arange(_FP_N))
    rows = []
    for scene in range(N_SCENES):
        m = b["scene"] == scene
        cl = wbf_np(
            b["box_id"][m], b["x0"][m], b["y0"][m],
            b["x1"][m], b["y1"][m], b["score"][m],
        )
        rows.append(
            (scene, len(cl),
             sum(c["n_members"] ** 2 for c in cl),
             sum(c["seed_id"] for c in cl),
             sum(c["fx0"] for c in cl), sum(c["fy0"] for c in cl),
             sum(c["fx1"] for c in cl), sum(c["fy1"] for c in cl))
        )
    return _values_sql(
        [("scene", "BIGINT"), ("n_clusters", "BIGINT"),
         ("memsq_sum", "BIGINT"), ("seedid_sum", "BIGINT"),
         ("fx0_sum", "BIGINT"), ("fy0_sum", "BIGINT"),
         ("fx1_sum", "BIGINT"), ("fy1_sum", "BIGINT")],
        rows,
    )


@register("box_fusion_fp", _wbf_fp_oracle)
def box_fusion_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Weighted Box Fusion over the fixed 4000-box
    fixture; per-scene cluster counts + fused-coordinate sums
    hash-checked against the sequential replay."""
    ids = fixture_range(spark, _FP_N).select(F.col("id").alias("event_id"))
    return box_fusion(boxes_from_ids(ids))


# ---------------------------------------------------------------------------
# panoptic_pq_fp — panoptic quality between dual Voronoi segmentations
# ---------------------------------------------------------------------------

PQ_CANVAS = 1024
PQ_TILE = 256
_N_PRED_SEEDS = 17
_N_GT_SEEDS = 13
_PQ_MICRO = 1_000_000


def _seeds(n: int, mx: int, my: int, cx: int, cy: int) -> np.ndarray:
    k = np.arange(n, dtype=np.int64)
    return np.stack([(mx * k + cx) % PQ_CANVAS, (my * k + cy) % PQ_CANVAS], 1)


def pred_seeds() -> np.ndarray:
    return _seeds(_N_PRED_SEEDS, 37, 59, 11, 23)


def gt_seeds() -> np.ndarray:
    return _seeds(_N_GT_SEEDS, 41, 61, 7, 13)


def voronoi_labels(xs: np.ndarray, ys: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """Nearest-seed label per (x, y) pixel: exact int64 squared distance,
    ties to the lowest seed id (np.argmin takes the first minimum)."""
    dx = xs[..., None] - seeds[:, 0]
    dy = ys[..., None] - seeds[:, 1]
    return np.argmin(dx * dx + dy * dy, axis=-1).astype(np.int64)


def _pq_tile_kernel(batches):
    ps, gs = pred_seeds(), gt_seeds()
    for pdf in batches:
        frames = []
        for tid in pdf["tile_id"].to_numpy(dtype=np.int64):
            tpt = PQ_CANVAS // PQ_TILE
            tx, ty = int(tid) % tpt, int(tid) // tpt
            xs = np.arange(tx * PQ_TILE, (tx + 1) * PQ_TILE, dtype=np.int64)
            ys = np.arange(ty * PQ_TILE, (ty + 1) * PQ_TILE, dtype=np.int64)
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            a = voronoi_labels(gx, gy, ps).ravel()
            b = voronoi_labels(gx, gy, gs).ravel()
            # joint histogram: <= 17*13 rows leave the executor per tile
            joint = np.bincount(
                a * _N_GT_SEEDS + b, minlength=_N_PRED_SEEDS * _N_GT_SEEDS
            )
            nz = np.flatnonzero(joint)
            frames.append(
                pd.DataFrame(
                    {
                        "a": nz // _N_GT_SEEDS,
                        "b": nz % _N_GT_SEEDS,
                        "cnt": joint[nz].astype(np.int64),
                    }
                )
            )
        if frames:
            yield pd.concat(frames)


def panoptic_pq(spark: SparkSession) -> DataFrame:
    """One-row exact PQ fingerprint.  Per-tile joint histograms (bounded
    by |pred segs| * |gt segs|) are the ONLY shuffled data; marginals
    give segment areas; IoU > 0.5 (exact ``3*inter > sa + sb`` since the
    segmentations partition the same canvas) selects the unique matches;
    PQ's SQ numerator is the integer microsum."""
    n_tiles = (PQ_CANVAS // PQ_TILE) ** 2
    tiles = fixture_range(spark, n_tiles).select(F.col("id").alias("tile_id"))
    joint = (
        tiles.mapInPandas(_pq_tile_kernel, "a bigint, b bigint, cnt bigint")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("inter"))
    )
    sa = joint.groupBy("a").agg(F.sum("inter").alias("sa"))
    sb = joint.groupBy("b").agg(F.sum("inter").alias("sb"))
    m = (
        joint.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .filter(3 * F.col("inter") > F.col("sa") + F.col("sb"))
    )
    counts = joint.agg(
        F.countDistinct("a").alias("n_pred"),
        F.countDistinct("b").alias("n_gt"),
    )
    stats = m.agg(
        F.count("*").alias("n_tp"),
        F.sum("inter").alias("inter_sum"),
        F.sum(
            F.expr(f"(inter * {_PQ_MICRO}) div (sa + sb - inter)")
        ).alias("pq_microsum"),
    )
    return counts.crossJoin(stats)  # 1 row x 1 row


def _pq_replay() -> tuple:
    xs = np.arange(PQ_CANVAS, dtype=np.int64)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    a = voronoi_labels(gx, gy, pred_seeds()).ravel()
    b = voronoi_labels(gx, gy, gt_seeds()).ravel()
    joint = np.bincount(
        a * _N_GT_SEEDS + b, minlength=_N_PRED_SEEDS * _N_GT_SEEDS
    ).reshape(_N_PRED_SEEDS, _N_GT_SEEDS)
    sa, sb = joint.sum(1), joint.sum(0)
    n_tp = inter_sum = pq_sum = 0
    for i in range(_N_PRED_SEEDS):
        for j in range(_N_GT_SEEDS):
            inter = int(joint[i, j])
            if inter and 3 * inter > int(sa[i]) + int(sb[j]):
                n_tp += 1
                inter_sum += inter
                pq_sum += inter * _PQ_MICRO // (int(sa[i]) + int(sb[j]) - inter)
    return (
        int((sa > 0).sum()), int((sb > 0).sum()), n_tp, inter_sum, pq_sum
    )


def _pq_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [("n_pred", "BIGINT"), ("n_gt", "BIGINT"), ("n_tp", "BIGINT"),
         ("inter_sum", "BIGINT"), ("pq_microsum", "BIGINT")],
        [_pq_replay()],
    )


@register("panoptic_pq_fp", _pq_fp_oracle)
def panoptic_pq_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panoptic quality between the 17-seed and 13-seed Voronoi
    segmentations of the 1024^2 canvas, computed from per-tile joint
    histograms; hash-checked against the whole-canvas replay."""
    return panoptic_pq(spark)
