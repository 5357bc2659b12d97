"""Adaptive quadtree tiling: variance-split leaf selection, fully
relational.

The reference picks ONE chunk size per variable by divisor alignment
(``conversion/utils.py:161-189``) and builds FIXED /2 pyramid levels
(``s2_optimization/s2_multiscale.py:51-58``).  An adaptive tiler is the
data-dependent generalization a 100 TB store wants: homogeneous regions
(sea, cloud-free desert) get big blocks, textured regions split down —
the classic variance-threshold quadtree (Samet, "The Quadtree and
Related Hierarchical Data Structures", ACM Computing Surveys 1984).

Spark-first shape — ZERO UDFs, every stage whole-stage-codegen:

1. bottom-up stats: per-16px-block ``(n, sum, sum_sq)`` from one
   groupBy over the pixel stream, then cascaded ``bx//2`` partial
   aggregations up to the 512 root — the exact pyramid-cascade shape
   (mean-of-sums, A15), so block variance numerators
   ``n*ss - s^2`` are EXACT int64 at every level (pixel values are
   bounded < 1024, so the worst term ``s^2`` at the root is
   ``(2^18 * 1023)^2 < 2^63``);
2. top-down reachability: a node is visited iff every proper ancestor
   split (``var_num > T * n^2``).  Child variance can exceed parent
   variance (up to 4x: ``Var_child <= (n/n_child) Var_parent``), so
   reachability must CASCADE — it is not a local parent test.  Each
   level joins its parent's (reached AND split) flag; level tables
   shrink 4x per step (1024 -> 1 rows), so all five joins broadcast;
3. leaf emit: reached AND (``var_num <= T*n^2`` OR at the 16px floor);
   floor nodes still above threshold are flagged ``forced``.

Leaves partition the canvas exactly (pinned by pytest), so the output
IS a valid adaptive chunk map.

Fixture: a deterministic 512^2 virtual raster with four variance
regimes (constant / 32px ramp / mod-64 texture / mod-1024 noise),
identical integer expressions in Spark, DuckDB, and NumPy — the oracle
is GENERATIVE SQL (DuckDB ``range`` + the same cascaded GROUP BYs), not
a VALUES literal, so the driver match re-proves the whole relational
pipeline on an independent engine.  At threshold T=1000 the fixture
yields leaves at three levels (2 @ 256px, 64 @ 32px, 256 forced
@ 16px) — both rule branches non-vacuous.

At 10^12-image scale the same plan applies per (scene, var) with the
base stats computed map-side from tile rows: only O(pixels/256) stat
rows ever shuffle, and every cascade level is a combinable partial agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import fixture_range
from .registry import register

QT_N = 512  # canvas edge
QT_MIN = 16  # block-size floor
QT_T = 1000  # variance threshold (population variance, exact numerator)
_LEVELS = [16, 32, 64, 128, 256, 512]


def _pixels(spark: SparkSession) -> DataFrame:
    """The virtual raster as (x, y, v) — pure column arithmetic."""
    ids = fixture_range(spark, QT_N * QT_N)
    x = F.expr(f"id div {QT_N}")
    y = F.pmod(F.col("id"), F.lit(QT_N))
    v = (
        F.when((x < 256) & (y < 256), F.lit(100))
        .when((x >= 256) & (y < 256), F.expr(f"((id div {QT_N}) % 256 div 32) * 120"))
        .when((x < 256) & (y >= 256), (x * 31 + y * 17) % 64)
        .otherwise((x * 1103515245 + y * 12345) % 1024)
    )
    return ids.select(x.alias("x"), y.alias("y"), v.cast("long").alias("v"))


import os as _os  # noqa: E402

#: base-block-row ceiling for the single-task cascade replay.  The whole
#: cascade/reachability/leaf algebra operates on the (pixels/QT_MIN^2)-row
#: base stats table — its ~12 plan branches cost ~3 dozen scheduler jobs
#: for sub-millisecond integer work.  Size-based dial; 0 disables.
_QT_SMALL_BASE = int(_os.environ.get("DMS_QT_SMALL_BASE", str(1 << 20)))


def _cascade_single_task(base: DataFrame, threshold: int) -> DataFrame:
    """Replay the cascade -> reachability -> leaf rules on the base stats
    in ONE task (all int64 sums/products — associative and exact, so the
    replay is bit-identical to the join algebra); executor-side via
    coalesced mapInPandas."""
    import pandas as pd

    def kernel(batches):
        stats: dict[int, dict] = {QT_MIN: {}}
        for pdf in batches:
            for bx, by, n, s, ss in zip(
                pdf["bx"], pdf["by"], pdf["n"], pdf["s"], pdf["ss"]
            ):
                stats[QT_MIN][(int(bx), int(by))] = (int(n), int(s), int(ss))
        for blk in _LEVELS[1:]:
            up: dict = {}
            for (bx, by), (n, s, ss) in stats[blk // 2].items():
                k = (bx // 2, by // 2)
                a = up.get(k, (0, 0, 0))
                up[k] = (a[0] + n, a[1] + s, a[2] + ss)
            stats[blk] = up

        def split(n, s, ss):
            return n * ss - s * s > threshold * n * n

        reached = {512: {k: True for k in stats[512]}}
        for blk in reversed(_LEVELS[:-1]):
            par = {
                k: reached[blk * 2][k] and split(*v)
                for k, v in stats[blk * 2].items()
                if k in reached[blk * 2]
            }
            reached[blk] = {
                (bx, by): par[(bx // 2, by // 2)]
                for (bx, by) in stats[blk]
                if (bx // 2, by // 2) in par
            }
        rows = []
        for blk in _LEVELS:
            is_floor = blk == QT_MIN
            for (bx, by), (n, s, ss) in stats[blk].items():
                r = reached[blk].get((bx, by))
                if r is None or not r:
                    continue
                sp = split(n, s, ss)
                if not is_floor and sp:
                    continue
                rows.append(
                    (blk, bx, by, n, s, n * ss - s * s,
                     1 if (is_floor and sp) else 0)
                )
        yield pd.DataFrame(
            rows,
            columns=["blk", "bx", "by", "n_px", "px_sum", "var_num", "forced"],
        )

    return base.coalesce(1).mapInPandas(
        kernel,
        "blk long, bx long, by long, n_px long, px_sum long, "
        "var_num long, forced long",
    )


def quadtree_leaves(spark: SparkSession, threshold: int = QT_T) -> DataFrame:
    """Adaptive quadtree leaves of the virtual raster: (blk, bx, by,
    n_px, px_sum, var_num, forced) where ``var_num = n*ss - s^2`` (the
    exact population-variance numerator, variance = var_num / n^2)."""
    base = (
        _pixels(spark)
        .groupBy(
            F.expr(f"x div {QT_MIN}").alias("bx"),
            F.expr(f"y div {QT_MIN}").alias("by"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
        # 1024-row table referenced by every cascade level, every
        # reachability join and every leaf branch (~12 plan occurrences):
        # checkpoint once so the 512^2-pixel base aggregation runs once
        .localCheckpoint(eager=True)
    )
    if _QT_SMALL_BASE > 0 and base.count() <= _QT_SMALL_BASE:
        return _cascade_single_task(base, threshold)

    stats = {QT_MIN: base}
    for blk in _LEVELS[1:]:
        stats[blk] = (
            stats[blk // 2]
            .groupBy(
                F.expr("bx div 2").alias("bx"), F.expr("by div 2").alias("by")
            )
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("ss").alias("ss"))
        )

    var_num = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    split = var_num > F.lit(threshold) * F.col("n") * F.col("n")

    # top-down reachability: root is reached; a child is reached iff its
    # parent is reached AND split.  Parent tables are tiny (<= 256 rows),
    # so Spark broadcasts every join.
    reached = {512: stats[512].select("bx", "by", F.lit(True).alias("reached"))}
    for blk in reversed(_LEVELS[:-1]):
        parent = (
            stats[blk * 2]
            .join(reached[blk * 2], ["bx", "by"])
            .select(
                F.col("bx").alias("pbx"),
                F.col("by").alias("pby"),
                (F.col("reached") & split).alias("reached"),
            )
        )
        reached[blk] = (
            stats[blk]
            .join(
                parent,
                (F.expr("bx div 2") == F.col("pbx"))
                & (F.expr("by div 2") == F.col("pby")),
            )
            .select("bx", "by", "reached")
        )

    leaves = None
    for blk in _LEVELS:
        is_floor = blk == QT_MIN
        lv = (
            stats[blk]
            .join(reached[blk], ["bx", "by"])
            .filter(F.col("reached") & (~split if not is_floor else F.lit(True)))
            .select(
                F.lit(blk).cast("long").alias("blk"),
                F.col("bx").cast("long").alias("bx"),
                F.col("by").cast("long").alias("by"),
                F.col("n").alias("n_px"),
                F.col("s").alias("px_sum"),
                var_num.alias("var_num"),
                (split if is_floor else F.lit(False))
                .cast("long")
                .alias("forced"),
            )
        )
        leaves = lv if leaves is None else leaves.unionByName(lv)
    return leaves


def _oracle_sql(threshold: int = QT_T) -> str:
    """Generative DuckDB twin: same raster, same cascade, same rules."""
    x, y = "(range // 512)", "(range % 512)"
    px = f"""
  SELECT {x} AS x, {y} AS y,
         CAST(CASE
           WHEN {x} < 256 AND {y} < 256 THEN 100
           WHEN {x} >= 256 AND {y} < 256 THEN (({x} % 256) // 32) * 120
           WHEN {x} < 256 THEN ({x}*31 + {y}*17) % 64
           ELSE ({x}*1103515245 + {y}*12345) % 1024
         END AS BIGINT) AS v
  FROM range({QT_N * QT_N})"""
    parts = [
        f"px AS ({px})",
        "l16 AS (SELECT x//16 AS bx, y//16 AS by, CAST(COUNT(*) AS BIGINT) AS n,"
        " CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v*v) AS BIGINT) AS ss"
        " FROM px GROUP BY 1, 2)",
    ]
    for blk in _LEVELS[1:]:
        parts.append(
            f"l{blk} AS (SELECT bx//2 AS bx, by//2 AS by,"
            " CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS s,"
            f" CAST(SUM(ss) AS BIGINT) AS ss FROM l{blk // 2} GROUP BY 1, 2)"
        )
    t = threshold
    parts.append("r512 AS (SELECT bx, by, TRUE AS reached FROM l512)")
    for blk in reversed(_LEVELS[:-1]):
        p = blk * 2
        parts.append(
            f"r{blk} AS (SELECT c.bx, c.by,"
            f" (r.reached AND p.n*p.ss - p.s*p.s > {t}*p.n*p.n) AS reached"
            f" FROM l{blk} c JOIN l{p} p ON c.bx//2 = p.bx AND c.by//2 = p.by"
            f" JOIN r{p} r ON p.bx = r.bx AND p.by = r.by)"
        )
    sels = []
    for blk in _LEVELS:
        leaf_cond = (
            "TRUE"
            if blk == QT_MIN
            else f"l.n*l.ss - l.s*l.s <= {t}*l.n*l.n"
        )
        forced = (
            f"CASE WHEN l.n*l.ss - l.s*l.s > {t}*l.n*l.n THEN 1 ELSE 0 END"
            if blk == QT_MIN
            else "0"
        )
        sels.append(
            f"SELECT CAST({blk} AS BIGINT) AS blk, l.bx, l.by, l.n AS n_px,"
            f" l.s AS px_sum, l.n*l.ss - l.s*l.s AS var_num,"
            f" CAST({forced} AS BIGINT) AS forced"
            f" FROM l{blk} l JOIN r{blk} r ON l.bx = r.bx AND l.by = r.by"
            f" WHERE r.reached AND {leaf_cond}"
        )
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


@register("quadtree_leaves", _oracle_sql)
def quadtree_leaves_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-split adaptive quadtree over the four-regime virtual
    raster; the generative-SQL oracle re-runs the identical cascaded
    aggregation + reachability pipeline in DuckDB."""
    return quadtree_leaves(spark)
