"""Global Otsu thresholding (Otsu, IEEE TSMC 1979) over distributed
histograms.

The classic automatic image binarization: pick the threshold t that
maximizes the between-class variance sigma_b^2(t) = w0*w1*(mu0-mu1)^2 of
the GLOBAL pixel histogram.  The reference repo thresholds rasters for
validity masks (mask semantics in its CF metadata); computing the
threshold itself from the full mosaic is the distributed step Spark adds
— and the same scan applies to any integer-binned column (the
oracle-backed query runs it on the events value histogram).

Determinism contract: the histogram is exact int64 (value, count); the
scan's cumulative sums w0(t), s0(t) and totals W, S are exact integers;
the only floats are the final ``num = s0*W - S*w0`` (computed EXACTLY in
decimal(38,0) — at 10^12-image scale s0*W overflows int64 — then cast
once to double) and the IEEE score num^2 / (w0*w1).  Both engines cast
the same exact integers through the same round-to-nearest, so scores are
bit-identical (the repo's identical-IEEE oracle pattern).

Scale shape: the per-tile histogram pass is one mapInPandas over the
scan (np.bincount, no Python loop) emitting at most one row per DISTINCT
value per tile; the groupBy(v) sum is map-side combinable.  The Otsu
scan itself runs on a single partition BY CONSTRUCTION: a u16 histogram
has <= 65536 rows no matter how many petabytes produced it, so the
unpartitioned cumulative window is bounded state, not a scale hazard
(callers with wider domains bin first).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..codecs import decode_image
from ..sources.tables import load_table
from .registry import register
from .tiling import TILE_PX


def histogram_tiles(tiles: DataFrame) -> DataFrame:
    """(v, cnt): exact global value histogram of the tile pixels."""

    def hist(batches):
        import pandas as pd

        for pdf in batches:
            acc = np.zeros(65536, dtype=np.int64)
            for b in pdf["data"]:
                acc += np.bincount(
                    decode_image(b, "raw-u16", TILE_PX, TILE_PX).ravel(),
                    minlength=65536,
                )
            nz = np.flatnonzero(acc)
            yield pd.DataFrame({"v": nz.astype(np.int64), "cnt": acc[nz]})

    return (
        tiles.select("data")
        .mapInPandas(hist, "v long, cnt long")
        .groupBy("v")
        .agg(F.sum("cnt").alias("cnt"))
    )


def otsu_scan(hist: DataFrame, v: str = "v", cnt: str = "cnt") -> DataFrame:
    """(t, w0, w1, score): between-class variance at every candidate
    threshold t (class 0 = values <= t), excluding the degenerate ends.

    score = (s0*W - S*w0)^2 / (w0*w1) — sigma_b^2 scaled by the constant
    W^2, monotone-equivalent for the argmax.
    """
    h = hist.select(F.col(v).alias("v"), F.col(cnt).alias("cnt"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.select(
        F.col("v").alias("t"),
        F.sum("cnt").over(w).alias("w0"),
        F.sum(F.col("v") * F.col("cnt")).over(w).alias("s0"),
    )
    tot = h.agg(
        F.sum("cnt").alias("W"), F.sum(F.col("v") * F.col("cnt")).alias("S")
    )
    num = (
        F.col("s0").cast("decimal(38,0)") * F.col("W")
        - F.col("S").cast("decimal(38,0)") * F.col("w0")
    ).cast("double")
    den = (
        F.col("w0").cast("decimal(38,0)") * (F.col("W") - F.col("w0"))
    ).cast("double")
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter((F.col("w0") > 0) & (F.col("w0") < F.col("W")))
        .select(
            "t",
            "w0",
            (F.col("W") - F.col("w0")).alias("w1"),
            (num * num / den).alias("score"),
        )
    )


def otsu_threshold(hist: DataFrame) -> DataFrame:
    """One row (t, w0, w1, score): the Otsu threshold — max score,
    smallest t on ties."""
    return otsu_scan(hist).orderBy(F.desc("score"), F.asc("t")).limit(1)


def reference_otsu(values: np.ndarray) -> int:
    """Sequential NumPy truth: argmax of between-class variance."""
    acc = np.bincount(values.ravel().astype(np.int64))
    v = np.flatnonzero(acc)
    c = acc[v].astype(np.float64)
    w0 = np.cumsum(c)
    s0 = np.cumsum(v * c)
    W, S = w0[-1], s0[-1]
    keep = (w0 > 0) & (w0 < W)
    num = s0 * W - S * w0
    with np.errstate(divide="ignore", invalid="ignore"):
        score = np.where(keep, num * num / (w0 * (W - w0)), -np.inf)
    return int(v[int(np.argmax(score))])


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

_OTSU_EVENTS_ORACLE = """
WITH h AS (
  SELECT CAST(floor(value * 10) AS BIGINT) AS v, COUNT(*) AS cnt
  FROM events GROUP BY 1),
cum AS (
  SELECT v AS t,
         SUM(cnt) OVER (ORDER BY v) AS w0,
         SUM(v * cnt) OVER (ORDER BY v) AS s0
  FROM h),
tot AS (SELECT SUM(cnt) AS W, SUM(v * cnt) AS S FROM h)
SELECT t, CAST(w0 AS BIGINT) AS w0, CAST(W - w0 AS BIGINT) AS w1,
       CAST(CAST(CAST(s0 AS HUGEINT) * W - CAST(S AS HUGEINT) * w0 AS DOUBLE)
            * CAST(CAST(s0 AS HUGEINT) * W - CAST(S AS HUGEINT) * w0 AS DOUBLE)
            / CAST(CAST(w0 AS HUGEINT) * (W - w0) AS DOUBLE) AS DOUBLE) AS score
FROM cum, tot
WHERE w0 > 0 AND w0 < W"""


@register("otsu_events", _OTSU_EVENTS_ORACLE)
def otsu_events(spark, sf_dir):
    """The full Otsu between-class-variance scan over the deci-binned
    events value histogram (~1800 candidate thresholds at sf0.01);
    identical-IEEE scores vs the SQL window replay."""
    ev = load_table(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 10).cast("long").alias("v")
    )
    hist = ev.groupBy("v").agg(F.count("*").alias("cnt"))
    return otsu_scan(hist)


@register("otsu_mosaic", None)  # pixel path; exactness in tests/test_threshold.py
def otsu_mosaic(spark, sf_dir):
    """Global Otsu threshold of the merged level-0 mosaic pixels —
    the distributed-histogram image path.  Rows-only; equality with the
    sequential NumPy reference is pinned in tests/test_threshold.py."""
    from .hydrology import _merged_tiles

    return otsu_threshold(histogram_tiles(_merged_tiles(spark)))


# ---------------------------------------------------------------------------
# global histogram equalization (two-pass transform)
# ---------------------------------------------------------------------------


def equalize_lut(hist_rows: list[tuple], levels: int) -> np.ndarray:
    """The classic equalization lookup table from (v, cnt) pairs:
    lut[v] = round((cdf(v) - cdf_min) * (levels-1) / (N - cdf_min)),
    round-half-up in pure integers.  65536-entry int64 array."""
    acc = np.zeros(65536, dtype=np.int64)
    for v, cnt in hist_rows:
        acc[v] = cnt
    cdf = np.cumsum(acc)
    n = int(cdf[-1])
    if n == 0:
        raise ValueError("empty histogram")
    nz = np.flatnonzero(acc)
    cdf_min = int(cdf[nz[0]])
    den = n - cdf_min
    if den == 0:  # single-valued image: map to 0
        return np.zeros(65536, dtype=np.int64)
    num = (cdf - cdf_min) * (levels - 1)
    return np.clip((2 * num + den) // (2 * den), 0, levels - 1)


def equalize_tiles(tiles: DataFrame, levels: int = 256) -> DataFrame:
    """Histogram-equalize every tile against the GLOBAL mosaic CDF —
    the canonical two-pass image transform: pass 1 aggregates the exact
    histogram (<= 65536 rows no matter the data volume), whose LUT is a
    driver-side metadata collect broadcast into pass 2's vectorized
    per-tile remap.  Emits per-tile integer fingerprints (sum/min/max of
    the remapped pixels) — the remapped bytes stay inside the task.

    Determinism: the LUT is pure integer round-half-up from exact
    counts; the remap is a table lookup — bit-identical at any
    parallelism (pinned vs a sequential NumPy reference on the full
    mosaic in tests/test_threshold.py).
    """
    hist_rows = [(r.v, r.cnt) for r in histogram_tiles(tiles).collect()]
    lut = equalize_lut(hist_rows, levels)
    spark = tiles.sparkSession
    blut = spark.sparkContext.broadcast(lut)

    def remap(batches):
        import pandas as pd

        t = blut.value
        for pdf in batches:
            out = {"var": [], "tile_x": [], "tile_y": [],
                   "eq_sum": [], "eq_min": [], "eq_max": []}
            for row in pdf.itertuples(index=False):
                eq = t[decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)]
                out["var"].append(row.var)
                out["tile_x"].append(row.tile_x)
                out["tile_y"].append(row.tile_y)
                out["eq_sum"].append(int(eq.sum()))
                out["eq_min"].append(int(eq.min()))
                out["eq_max"].append(int(eq.max()))
            yield pd.DataFrame(out)

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        remap,
        "var string, tile_x long, tile_y long, eq_sum long, eq_min long, eq_max long",
    )


@register("equalize_mosaic", None)  # pixel path; tests/test_threshold.py
def equalize_mosaic(spark, sf_dir):
    """Global histogram equalization of the merged level-0 mosaic to 256
    display levels: per-tile integer fingerprints of the remapped
    pixels.  Rows-only; bit-equality with the sequential NumPy reference
    on the full mosaic is pinned in tests/test_threshold.py."""
    from .hydrology import _merged_tiles

    return equalize_tiles(_merged_tiles(spark), levels=256)
