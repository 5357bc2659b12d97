"""Dynamic-time-warping trajectory similarity join.

Hausdorff (``trajectory.hausdorff_join``) ignores ordering; DTW is the
sequence-aware counterpart: the minimum total squared-distance cost of a
monotone alignment between two ordered tracks (Berndt & Clifford, KDD
1994).  ``dtw_pairs`` finds all pairs with DTW cost <= theta.

Candidate completeness is a theorem, same as Hausdorff's: every point
of A is matched to SOME point of B in the optimal alignment, so
``DTW(A,B) <= theta`` forces every A point within ``sqrt(theta)`` of B;
the theta-dilated bounding boxes therefore intersect and share a cover
cell.  Candidates come from the same bbox -> cell-cover equi-join, and
only candidate pairs pay the O(len_a * len_b) DP refine.  Honesty note
on pruning: total-cost DTW thresholds carry a sqrt(track length) factor
(theta must exceed ``L * pitch^2`` for any neighbor to match), so the
sqrt(theta) dilation only prunes pairs more than ~sqrt(L) pitches
apart — real at corpus scale (kilometer-separated tracks), vacuous on
the 12-walk fixture, where every pair is refined; the pruning machinery
itself is the Hausdorff join's, driver-proven by ``hausdorff_pairs``.

Refine shape: tracks collapse to per-key ordered arrays (bounded by the
per-track fix cap — the same contract as ``traj_simplify``), the pair
join ships two arrays per row, and the Arrow kernel runs the integer DP
(all int64: costs are sums of squared grid distances).

Fixture: the 12 fixed 120-point walks (``trajectory._fixture_walks_np``)
placed on a 4x3 macro-grid at 300-unit pitch — near neighbors align
cheaply, far ones never enter the candidate set.  sf-independent, so the
sequential-replay VALUES oracle is exact at every scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .trajectory import _fixture_walks_np, _traj_fixture

DTW_THETA = 12_000_000
_PITCH = 300


def dtw_np(ax, ay, bx, by) -> int:
    """Exact integer DTW cost (full DP, no band)."""
    ax, ay = np.asarray(ax, np.int64), np.asarray(ay, np.int64)
    bx, by = np.asarray(bx, np.int64), np.asarray(by, np.int64)
    dd = (ax[:, None] - bx[None, :]) ** 2 + (ay[:, None] - by[None, :]) ** 2
    n, m = dd.shape
    big = np.int64(1) << 62
    prev = np.full(m + 1, big, dtype=np.int64)
    prev[0] = 0
    for i in range(n):
        cur = np.full(m + 1, big, dtype=np.int64)
        best = np.minimum(prev[1:], prev[:-1])
        # cur[j] = dd[i, j-1] + min(prev[j], prev[j-1], cur[j-1]): the
        # cur[j-1] term is a sequential prefix — do it in a tight loop
        run = big
        for j in range(m):
            run = dd[i, j] + min(best[j], run)
            cur[j + 1] = run
        prev = cur
    return int(prev[m])


def _offset_fixture_np():
    """Walks on the macro-grid: key -> (x, y) arrays."""
    out = {}
    for u, seq, x, y in _fixture_walks_np():
        out[u] = (x + (u % 4) * _PITCH, y + (u // 4) * _PITCH)
    return out


def _offset_fixture_df(spark: SparkSession) -> DataFrame:
    f = _traj_fixture(spark)
    return f.select(
        F.col("user_id").alias("key"),
        "seq",
        (F.col("x") + F.pmod("user_id", F.lit(4)) * _PITCH).alias("x"),
        (F.col("y") + F.expr("user_id div 4") * _PITCH).alias("y"),
    )


def dtw_pairs(
    fixes: DataFrame, theta: int = DTW_THETA, cell_shift: int = 9
) -> DataFrame:
    """(key_a, key_b, dtw) for all pairs with DTW cost <= theta."""
    import math

    d = math.isqrt(int(theta))
    if d * d < theta:
        d += 1
    c = cell_shift
    bb = fixes.groupBy("key").agg(
        F.min("x").alias("x0"), F.max("x").alias("x1"),
        F.min("y").alias("y0"), F.max("y").alias("y1"),
    )
    cover = bb.select(
        "key",
        F.explode(
            F.expr(
                f"flatten(transform("
                f"sequence(shiftright(x0 - {d}, {c}), shiftright(x1 + {d}, {c})),"
                f" gx -> transform("
                f"sequence(shiftright(y0 - {d}, {c}), shiftright(y1 + {d}, {c})),"
                f" gy -> struct(gx AS gx, gy AS gy))))"
            )
        ).alias("g"),
    ).select("key", F.col("g.gx").alias("gx"), F.col("g.gy").alias("gy"))
    pairs = (
        cover.select(F.col("key").alias("ka"), "gx", "gy")
        .join(cover.select(F.col("key").alias("kb"), "gx", "gy"), ["gx", "gy"])
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "kb")
        .distinct()
    )
    tracks = fixes.groupBy("key").agg(
        F.sort_array(F.collect_list(F.struct("seq", "x", "y"))).alias("t")
    )
    cand = (
        pairs.join(tracks.select(F.col("key").alias("ka"), F.col("t").alias("ta")), "ka")
        .join(tracks.select(F.col("key").alias("kb"), F.col("t").alias("tb")), "kb")
    )

    def kernel(batches):
        for pdf in batches:
            rows = []
            for ka, kb, ta, tb in zip(
                pdf["ka"], pdf["kb"], pdf["ta"], pdf["tb"]
            ):
                cost = dtw_np(
                    [p["x"] for p in ta], [p["y"] for p in ta],
                    [p["x"] for p in tb], [p["y"] for p in tb],
                )
                rows.append((int(ka), int(kb), cost))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["key_a", "key_b", "dtw"]
                )

    out = cand.mapInPandas(kernel, "key_a bigint, key_b bigint, dtw bigint")
    return out.filter(F.col("dtw") <= theta)


def _dtw_replay() -> list[tuple]:
    walks = _offset_fixture_np()
    keys = sorted(walks)
    rows = []
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            cost = dtw_np(*walks[a], *walks[b])
            if cost <= DTW_THETA:
                rows.append((a, b, cost))
    return rows


def _dtw_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [("key_a", "BIGINT"), ("key_b", "BIGINT"), ("dtw", "BIGINT")],
        _dtw_replay(),
    )


@register("dtw_pairs", _dtw_oracle)
def dtw_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW similarity join over the macro-grid walk fixture; the oracle
    is the brute-force all-pairs replay, so a driver match proves
    bbox-candidate completeness AND the integer DP."""
    return dtw_pairs(_offset_fixture_df(spark))
