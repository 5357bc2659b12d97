"""Trajectory simplification (Douglas-Peucker, integer-exact).

The vector companion to ``trajectory_cell_cover``'s rasterization: GPS
tracks at ingest resolution carry orders of magnitude more fixes than
their shape needs; Douglas-Peucker (1973) keeps the minimal subset whose
polyline stays within a tolerance of the original.

Determinism contract: fixes are INTEGER grid coordinates (the fixture's
milli-degrees; real users pass scaled-integer microdegrees), and every
decision compares ``cross^2 > tol^2 * chord_len^2`` in int64 — the exact
fraction comparison for squared perpendicular distance, no float, no
epsilon, so the kept set is bit-identical at any parallelism.  Argmax
ties break on the lowest index.  The per-track coordinate span must stay
below ~40000 units so ``cross^2 <= 4*span^4`` fits in int64 (guarded
with a ValueError; the threshold side is arbitrary-precision Python
int, so ``tol`` itself is unbounded).

Scale shape: ONE shuffle on the trajectory key (``applyInPandas``); each
group runs the iterative stack algorithm in NumPy.  A trajectory is one
device's track — bounded (millions of fixes at worst), so per-group
memory is bounded; 10^12 fixes across 10^8 devices parallelize across
the key space.  Non-SQL-expressible (data-dependent recursion), so the
registered query is rows-only; exactness is pinned by the recursive
NumPy reference and the within-tolerance invariant in
``tests/test_trajectory.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register


def dp_mask(x: np.ndarray, y: np.ndarray, tol: int) -> np.ndarray:
    """Boolean keep-mask for one ordered track (integer coords)."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    span = max(
        int(x.max()) - int(x.min()), int(y.max()) - int(y.min()), 1
    )
    if 4 * span**4 >= 2**63:  # cross^2 <= 4*span^4 must fit in int64
        raise ValueError(
            f"coordinate span {span} too large for int64-exact DP — "
            "rescale fixes below ~40000 units"
        )
    tol2 = int(tol) * int(tol)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        dx, dy = int(x[b] - x[a]), int(y[b] - y[a])
        len2 = dx * dx + dy * dy
        xs, ys = x[a + 1 : b], y[a + 1 : b]
        if len2 == 0:
            # degenerate chord (loop): point distance to the anchor
            num = (xs - x[a]) ** 2 + (ys - y[a]) ** 2
            thresh = tol2
        else:
            cross = dx * (ys - y[a]) - dy * (xs - x[a])
            num = cross * cross
            thresh = tol2 * len2
        i = int(np.argmax(num))  # first max: np.argmax's tie rule
        if num[i] > thresh:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_trajectories(
    fixes: DataFrame,
    tol: int,
    key: str = "user_id",
    seq: str = "seq",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Douglas-Peucker per ``key`` over integer fixes ordered by ``seq``."""
    src = fixes.select(
        F.col(key).alias("key"),
        F.col(seq).alias("seq"),
        F.col(x).cast("long").alias("x"),
        F.col(y).cast("long").alias("y"),
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        m = dp_mask(pdf["x"].to_numpy(np.int64), pdf["y"].to_numpy(np.int64), tol)
        return pdf.loc[m]

    out = src.groupBy("key").applyInPandas(run, "key long, seq long, x long, y long")
    return out.select(
        F.col("key").alias(key), F.col("seq").alias(seq), "x", "y"
    )


@register("traj_simplify", None)
def traj_simplify(spark, sf_dir):
    """Simplify the per-user milli-degree random walks (the same fixture
    as ``trajectory_cell_cover``) at tol=15 milli-degrees; rows-only —
    DP's data-dependent recursion is not SQL-expressible; exactness is
    pinned by the recursive-reference and invariant pytests."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    d = ev.withColumn(
        "dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10
    ).withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = (
        d.withColumn("x", F.sum("dlon").over(w))
        .withColumn("y", F.sum("dlat").over(w))
        .withColumn("seq", F.row_number().over(w))
        .select("user_id", "seq", "x", "y")
    )
    return simplify_trajectories(pos, tol=15)


def stay_points(
    fixes: DataFrame,
    d2: int,
    min_dur_us: int,
    key: str = "user_id",
    seq: str = "seq",
    ts_us: str = "ts_us",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Stay-point detection (Li et al., GIS 2008 anchor scan).

    A stay point is a maximal run of consecutive fixes all within
    ``sqrt(d2)`` grid units of the run's FIRST fix (the anchor) whose
    time span is >= ``min_dur_us``.  The scan is the published greedy:
    extend from the anchor until the first violator, emit if long
    enough, resume at the violator (else at anchor+1).  All comparisons
    are integer (squared distances, microsecond spans) — deterministic
    at any parallelism.  Output per stay: (key, start_seq, end_seq,
    n_fixes, x_sum, y_sum, dur_us) — integer sums so the centroid is a
    caller-side exact fraction.

    Same scale shape as ``simplify_trajectories``: one shuffle on the
    trajectory key, sequential NumPy scan per group.  Sequential
    data-dependent control flow => rows-only (no SQL oracle); the
    reference-scan pytests pin exactness.
    """
    src = fixes.select(
        F.col(key).alias("key"),
        F.col(seq).alias("seq"),
        F.col(ts_us).cast("long").alias("ts_us"),
        F.col(x).cast("long").alias("x"),
        F.col(y).cast("long").alias("y"),
    )
    out_schema = (
        "key long, start_seq long, end_seq long, n_fixes long, "
        "x_sum long, y_sum long, dur_us long"
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        xs = pdf["x"].to_numpy(np.int64)
        ys = pdf["y"].to_numpy(np.int64)
        ts = pdf["ts_us"].to_numpy(np.int64)
        sq = pdf["seq"].to_numpy(np.int64)
        n = len(pdf)
        recs = []
        i = 0
        while i < n - 1:
            dx = xs[i + 1 :] - xs[i]
            dy = ys[i + 1 :] - ys[i]
            viol = np.flatnonzero(dx * dx + dy * dy > d2)
            j = n - 1 if viol.size == 0 else i + int(viol[0])  # last in-range
            if j > i and ts[j] - ts[i] >= min_dur_us:
                recs.append(
                    {
                        "key": int(pdf["key"].iloc[0]),
                        "start_seq": int(sq[i]),
                        "end_seq": int(sq[j]),
                        "n_fixes": int(j - i + 1),
                        "x_sum": int(xs[i : j + 1].sum()),
                        "y_sum": int(ys[i : j + 1].sum()),
                        "dur_us": int(ts[j] - ts[i]),
                    }
                )
                i = j + 1
            else:
                i += 1
        cols = ["key", "start_seq", "end_seq", "n_fixes", "x_sum", "y_sum", "dur_us"]
        return pd.DataFrame.from_records(recs, columns=cols)

    out = src.groupBy("key").applyInPandas(run, out_schema)
    return out.withColumnRenamed("key", key)


@register("traj_stay_points", None)
def traj_stay_points(spark, sf_dir):
    """Stay points of the per-user milli-degree walks (d=25 units,
    min duration 15 h); rows-only — sequential anchor scan is not
    SQL-expressible; exactness pinned by tests/test_trajectory.py."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    d = ev.withColumn(
        "dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10
    ).withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = (
        d.withColumn("x", F.sum("dlon").over(w))
        .withColumn("y", F.sum("dlat").over(w))
        .withColumn("seq", F.row_number().over(w))
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
        .select("user_id", "seq", "ts_us", "x", "y")
    )
    return stay_points(pos, d2=625, min_dur_us=15 * 3600 * 1_000_000)
