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
