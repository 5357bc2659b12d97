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

from ..sources.tables import fixture_range, load_table
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


def stay_scan(
    key: int,
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    sq: np.ndarray,
    d2: int,
    min_dur_us: int,
) -> list[dict]:
    """The Li et al. anchor scan for ONE seq-sorted track (pure NumPy) —
    module-level so the distributed ``stay_points`` kernel and the
    ``traj_stay_points_fp`` sequential oracle replay share one
    implementation."""
    n = len(xs)
    recs: list[dict] = []
    i = 0
    while i < n - 1:
        dx = xs[i + 1 :] - xs[i]
        dy = ys[i + 1 :] - ys[i]
        viol = np.flatnonzero(dx * dx + dy * dy > d2)
        j = n - 1 if viol.size == 0 else i + int(viol[0])  # last in-range
        if j > i and ts[j] - ts[i] >= min_dur_us:
            recs.append(
                {
                    "key": key,
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
    return recs


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
        recs = stay_scan(
            int(pdf["key"].iloc[0]),
            pdf["x"].to_numpy(np.int64),
            pdf["y"].to_numpy(np.int64),
            pdf["ts_us"].to_numpy(np.int64),
            pdf["seq"].to_numpy(np.int64),
            d2,
            min_dur_us,
        )
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


# ---------------------------------------------------------------------------
# oracle twins on a seeded sf-independent fixture
#
# The sf-fixture queries above are honestly rows-only (their input rides
# the driver's events table; DP / the anchor scan are data-dependent
# recursion DuckDB cannot express).  These twins run the SAME operators
# over a deterministic spark.range walk — alternating 20-fix moving /
# stationary blocks, so both the simplification and the stay detection
# are non-vacuous — and hash-check against sequential replays through
# the shared ``dp_mask`` / ``stay_scan`` kernels.
# ---------------------------------------------------------------------------

_FIX_USERS, _FIX_LEN, _FIX_BLOCK = 12, 120, 20
_HOUR_US = 3_600_000_000


def _traj_fixture(spark) -> DataFrame:
    ids = fixture_range(spark, _FIX_USERS * _FIX_LEN)
    seq = F.col("id") % _FIX_LEN + 1
    move = ((seq - 1) / _FIX_BLOCK).cast("long") % 2 == 0
    d = ids.select(
        (F.col("id") / _FIX_LEN).cast("long").alias("user_id"),
        seq.alias("seq"),
        ((F.pmod(F.col("id") * 37, F.lit(21)) - 10)
         * F.when(move, 1).otherwise(0)).alias("dlon"),
        ((F.pmod(F.col("id") * 91, F.lit(21)) - 10)
         * F.when(move, 1).otherwise(0)).alias("dlat"),
    )
    w = Window.partitionBy("user_id").orderBy("seq")
    return d.select(
        "user_id",
        "seq",
        F.sum("dlon").over(w).alias("x"),
        F.sum("dlat").over(w).alias("y"),
        (F.col("seq") * _HOUR_US).alias("ts_us"),
    )


def _fixture_walks_np():
    for u in range(_FIX_USERS):
        gid = np.arange(_FIX_LEN, dtype=np.int64) + u * _FIX_LEN
        seq = np.arange(1, _FIX_LEN + 1, dtype=np.int64)
        mv = (((seq - 1) // _FIX_BLOCK) % 2 == 0).astype(np.int64)
        x = (((gid * 37) % 21 - 10) * mv).cumsum()
        y = (((gid * 91) % 21 - 10) * mv).cumsum()
        yield u, seq, x, y


def _traj_simplify_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for u, seq, x, y in _fixture_walks_np():
        keep = dp_mask(x, y, 15)
        rows.extend(
            (u, int(seq[i]), int(x[i]), int(y[i])) for i in np.flatnonzero(keep)
        )
    return _values_sql(
        [
            ("user_id", "BIGINT"),
            ("seq", "BIGINT"),
            ("x", "BIGINT"),
            ("y", "BIGINT"),
        ],
        rows,
    )


@register("traj_simplify_fp", _traj_simplify_oracle)
def traj_simplify_fp(spark, sf_dir):
    """``traj_simplify``'s oracle twin: the same integer-exact DP
    ``applyInPandas`` operator over the seeded block-walk fixture,
    hash-checked against the sequential ``dp_mask`` replay."""
    return simplify_trajectories(_traj_fixture(spark), tol=15)


def _traj_stays_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for u, seq, x, y in _fixture_walks_np():
        for r in stay_scan(
            u, x, y, seq * _HOUR_US, seq, 625, 15 * _HOUR_US
        ):
            rows.append(
                (
                    r["key"], r["start_seq"], r["end_seq"], r["n_fixes"],
                    r["x_sum"], r["y_sum"], r["dur_us"],
                )
            )
    return _values_sql(
        [
            ("user_id", "BIGINT"),
            ("start_seq", "BIGINT"),
            ("end_seq", "BIGINT"),
            ("n_fixes", "BIGINT"),
            ("x_sum", "BIGINT"),
            ("y_sum", "BIGINT"),
            ("dur_us", "BIGINT"),
        ],
        rows,
    )


@register("traj_stay_points_fp", _traj_stays_oracle)
def traj_stay_points_fp(spark, sf_dir):
    """``traj_stay_points``'s oracle twin: same anchor-scan operator over
    the block-walk fixture (every stationary block is a stay point, so
    the oracle is structurally non-vacuous), replayed via the shared
    ``stay_scan`` kernel."""
    return stay_points(
        _traj_fixture(spark), d2=625, min_dur_us=15 * _HOUR_US
    )


# ---------------------------------------------------------------------------
# trajectory similarity join (discrete Hausdorff)
# ---------------------------------------------------------------------------


def hausdorff_join(fixes: DataFrame, d2: int, cell_shift: int = 9) -> DataFrame:
    """(key_a, key_b, haus_d2): trajectory pairs with discrete Hausdorff
    distance squared <= ``d2``, exact.

    The classic trajectory similarity join: H(A,B) = max of the two
    directed distances max_a min_b |a-b|.  Candidates come from a
    cell-bucketed bbox join — each trajectory's bounding box, dilated by
    d = ceil(sqrt(d2)), is covered with 2^cell_shift-sized grid cells
    (arithmetic shift = exact floor division on negative coords), and
    only pairs sharing a cover cell are refined.  Complete by
    construction: H(A,B) <= d forces every point of A within d of B, so
    the dilated boxes intersect and share a cell.

    The refine is the exact all-point-pairs min/max over each CANDIDATE
    pair only (the standard exact evaluation; quadratic per pair — feed
    ``simplify_trajectories`` output for long tracks).  All arithmetic is
    int64, so the join is plan-independent and SQL-replayable; the
    registered oracle is the independent BRUTE-FORCE join over all
    trajectory pairs, so a driver match proves candidate completeness,
    not just refine agreement.

    Scale shape: one bbox aggregation (map-side combinable), a bounded
    cover explode (pure JVM ``sequence``), one cell-keyed pair join, and
    two grouped aggregations over candidate point pairs.  Hot cells fan
    out at most (trajectories-per-cell choose 2) pairs — the same
    locality contract as ``spatial.radius_join``.
    """
    import math

    d = math.isqrt(int(d2))
    if d * d < d2:
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
    a = cover.select(F.col("key").alias("ka"), "gx", "gy")
    b = cover.select(F.col("key").alias("kb"), "gx", "gy")
    pairs = (
        a.join(b, ["gx", "gy"])
        .filter(F.col("ka") < F.col("kb"))
        .select("ka", "kb")
        .distinct()
    )

    pts = fixes.select("key", "x", "y")
    pp = (
        pairs.join(pts.select(F.col("key").alias("ka"), F.col("x").alias("ax"), F.col("y").alias("ay")), "ka")
        .join(pts.select(F.col("key").alias("kb"), F.col("x").alias("bx"), F.col("y").alias("by")), "kb")
        .withColumn(
            "dd",
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")),
        )
    )
    h_ab = (
        pp.groupBy("ka", "kb", "ax", "ay").agg(F.min("dd").alias("md"))
        .groupBy("ka", "kb").agg(F.max("md").alias("h_ab"))
    )
    h_ba = (
        pp.groupBy("ka", "kb", "bx", "by").agg(F.min("dd").alias("md"))
        .groupBy("ka", "kb").agg(F.max("md").alias("h_ba"))
    )
    return (
        h_ab.join(h_ba, ["ka", "kb"])
        .select(
            F.col("ka").alias("key_a"),
            F.col("kb").alias("key_b"),
            F.greatest("h_ab", "h_ba").alias("haus_d2"),
        )
        .filter(F.col("haus_d2") <= d2)
    )


_HAUS_D2 = 90000  # d = 300 grid units

# per-user origin offsets spread the walks over a 10x10 macro-grid so the
# bbox candidate join actually prunes (9x at sf0.01: 1207 of 11175 pairs)
_OFFSET_POS_CTE = """
ev AS (SELECT event_id, ts, user_id,
       (event_id * 37 % 21) - 10 AS dlon, (event_id * 91 % 21) - 10 AS dlat
       FROM events),
pos AS (SELECT user_id AS key,
        (user_id % 10) * 400 + SUM(dlon) OVER w AS x,
        ((user_id // 10) % 10) * 400 + SUM(dlat) OVER w AS y
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))"""

_HAUS_ORACLE = f"""
WITH {_OFFSET_POS_CTE[1:]},
pairs AS (SELECT DISTINCT a.key AS ka, b.key AS kb FROM pos a JOIN pos b ON a.key < b.key),
ptd AS (
  SELECT p.ka, p.kb, a.x AS ax, a.y AS ay,
         MIN((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS md
  FROM pairs p JOIN pos a ON a.key = p.ka JOIN pos b ON b.key = p.kb
  GROUP BY 1, 2, 3, 4),
dira AS (SELECT ka, kb, MAX(md) AS h FROM ptd GROUP BY 1, 2),
ptd2 AS (
  SELECT p.ka, p.kb, b.x AS bx, b.y AS by,
         MIN((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS md
  FROM pairs p JOIN pos a ON a.key = p.ka JOIN pos b ON b.key = p.kb
  GROUP BY 1, 2, 3, 4),
dirb AS (SELECT ka, kb, MAX(md) AS h FROM ptd2 GROUP BY 1, 2)
SELECT a.ka AS key_a, a.kb AS key_b,
       CAST(GREATEST(a.h, b.h) AS BIGINT) AS haus_d2
FROM dira a JOIN dirb b ON a.ka = b.ka AND a.kb = b.kb
WHERE GREATEST(a.h, b.h) <= {_HAUS_D2}"""


def _offset_walks(spark, sf_dir) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    d = ev.withColumn(
        "dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10
    ).withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return d.select(
        F.col("user_id").alias("key"),
        (F.pmod("user_id", F.lit(10)) * 400 + F.sum("dlon").over(w)).alias("x"),
        (F.pmod(F.expr("user_id div 10"), F.lit(10)) * 400
         + F.sum("dlat").over(w)).alias("y"),
    )


@register("hausdorff_pairs", _HAUS_ORACLE)
def hausdorff_pairs(spark, sf_dir):
    """Trajectory pairs within Hausdorff distance 300 over the offset
    per-user walks; the oracle is the brute-force all-pairs join, so the
    driver match proves bbox-candidate completeness end to end."""
    return hausdorff_join(_offset_walks(spark, sf_dir), d2=_HAUS_D2)


# ---------------------------------------------------------------------------
# co-movement (convoy / travel-together) detection
# ---------------------------------------------------------------------------


def comovement(
    fixes: DataFrame, d2: int, min_run: int, cell_shift: int
) -> DataFrame:
    """(key_a, key_b, n_buckets, max_run): pairs of trajectories that are
    COMPANIONS (squared distance <= ``d2``) in at least ``min_run``
    CONSECUTIVE time buckets — the pairwise core of convoy / flock
    detection (Jeung et al., VLDB'08).

    ``fixes`` holds one representative integer position per (key, tb)
    (take the bucket's last fix upstream).  Candidates come from ONE
    equi-join on (tb, cell): the lower-key side explodes to its 3x3 cell
    neighborhood map-side (the ``radius_join`` locality contract), the
    higher-key side keeps its single containing cell, so every companion
    pair is found exactly once per bucket — complete because
    2^cell_shift >= d means companions are at most one cell apart per
    axis.  The exact int64 refine keeps true companions; consecutive
    runs come from the standard gaps-and-islands window (tb minus the
    pair-ordered row number is constant exactly on a run).

    Scale shape: bucket snapping rides the trajectory-key window; the
    pair join shuffles on (tb, cell) — time-sliced, so a day of 10^12
    fixes never meets another day's; runs/aggregation shuffle on the
    surviving pair keys only.  Hot cells fan out like ``radius_join``
    (AQE skew splitting / res+1 pre-split apply unchanged).
    """
    d_ceil = 1 << cell_shift
    if d_ceil * d_ceil < d2:
        raise ValueError(
            f"cell_shift={cell_shift} cells are {d_ceil} units — smaller "
            f"than sqrt(d2)={d2 ** 0.5:.0f}; companions one ring apart "
            "would be missed (use a coarser shift)"
        )
    c = cell_shift
    cells = fixes.select(
        "key", "tb", "x", "y",
        F.shiftright("x", c).alias("gx"), F.shiftright("y", c).alias("gy"),
    )
    a = cells.select(
        F.col("key").alias("ka"), "tb",
        F.col("x").alias("ax"), F.col("y").alias("ay"),
        F.explode(
            F.expr(
                "flatten(transform(sequence(gx - 1, gx + 1), "
                "i -> transform(sequence(gy - 1, gy + 1), "
                "j -> struct(i AS gx, j AS gy))))"
            )
        ).alias("g"),
    ).select("ka", "tb", "ax", "ay", F.col("g.gx").alias("gx"), F.col("g.gy").alias("gy"))
    b = cells.select(
        F.col("key").alias("kb"), "tb",
        F.col("x").alias("bx"), F.col("y").alias("by"), "gx", "gy",
    )
    comp = (
        a.join(b, ["tb", "gx", "gy"])
        .filter(F.col("ka") < F.col("kb"))
        .filter(
            (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
            + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by"))
            <= F.lit(d2)
        )
        .select("ka", "kb", "tb")
    )
    w = Window.partitionBy("ka", "kb").orderBy("tb")
    runs = comp.withColumn("island", F.col("tb") - F.row_number().over(w))
    per_island = runs.groupBy("ka", "kb", "island").agg(
        F.count("*").alias("run_len")
    )
    return (
        per_island.groupBy("ka", "kb")
        .agg(F.sum("run_len").alias("n_buckets"), F.max("run_len").alias("max_run"))
        .filter(F.col("max_run") >= min_run)
        .select(
            F.col("ka").alias("key_a"), F.col("kb").alias("key_b"),
            "n_buckets", "max_run",
        )
    )


_CONVOY_D2 = 3600  # d = 60 grid units; cell_shift 6 -> 64-unit cells
_CONVOY_MIN_RUN = 3

_CONVOY_ORACLE = f"""
WITH {_OFFSET_POS_CTE[1:].replace("pos AS (SELECT user_id AS key,",
    "pos AS (SELECT user_id AS key, ts, event_id,")},
snap AS (SELECT key,
         CAST(date_diff('day', TIMESTAMP '2024-01-01', ts) AS BIGINT) AS tb,
         x, y,
         ROW_NUMBER() OVER (PARTITION BY key, date_diff('day', TIMESTAMP '2024-01-01', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
         FROM pos),
fix AS (SELECT key, tb, x, y FROM snap WHERE rn = 1),
comp AS (SELECT a.key AS ka, b.key AS kb, a.tb
         FROM fix a JOIN fix b ON a.tb = b.tb AND a.key < b.key
         AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= {_CONVOY_D2}),
isl AS (SELECT ka, kb, tb,
        tb - ROW_NUMBER() OVER (PARTITION BY ka, kb ORDER BY tb) AS island
        FROM comp),
per_isl AS (SELECT ka, kb, island, count(*) AS run_len
            FROM isl GROUP BY 1, 2, 3)
SELECT ka AS key_a, kb AS key_b,
       CAST(SUM(run_len) AS BIGINT) AS n_buckets,
       CAST(MAX(run_len) AS BIGINT) AS max_run
FROM per_isl GROUP BY 1, 2 HAVING MAX(run_len) >= {_CONVOY_MIN_RUN}"""


def _bucketed_walks(spark, sf_dir) -> DataFrame:
    """Last position of each user's offset walk per UTC day bucket."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    d = ev.withColumn(
        "dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10
    ).withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = d.select(
        F.col("user_id").alias("key"), "ts", "event_id",
        (F.pmod("user_id", F.lit(10)) * 400 + F.sum("dlon").over(w)).alias("x"),
        (F.pmod(F.expr("user_id div 10"), F.lit(10)) * 400
         + F.sum("dlat").over(w)).alias("y"),
    ).withColumn(
        "tb", F.datediff(F.to_date("ts"), F.lit("2024-01-01")).cast("long")
    )
    wb = Window.partitionBy("key", "tb").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        pos.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") == 1)
        .select("key", "tb", "x", "y")
    )


@register("convoy_pairs", _CONVOY_ORACLE)
def convoy_pairs(spark, sf_dir):
    """User pairs travelling together (within 60 units at day-bucket
    granularity) for >= 3 consecutive days over the offset walks; the
    oracle is the brute-force per-bucket pairs join plus the identical
    gaps-and-islands windows, so a driver match proves 3x3-ring
    candidate completeness AND run assembly."""
    return comovement(
        _bucketed_walks(spark, sf_dir),
        d2=_CONVOY_D2, min_run=_CONVOY_MIN_RUN, cell_shift=6,
    )
