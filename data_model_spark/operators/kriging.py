"""Ordinary kriging: variogram-model interpolation onto a cell grid.

The geostatistical upgrade of ``surfaces.idw_grid``: instead of ad-hoc
inverse-distance weights, each grid estimate solves the ordinary-kriging
system for the k nearest observations under a fixed spherical variogram
model — the BLUE estimator that ``empirical_variogram``
(``operators/geostats.py``) exists to parameterize.  The reference
interpolates scattered GCP grids onto pixel grids for reprojection
(``src/eopf_geozarr/conversion/geozarr.py`` GCP handling); kriging is
the same scatter->grid move with a principled weight model and a
per-cell uncertainty (the kriging variance).

Distributed design (100 TB shape):

* points key by containing cell (pure JVM floor arithmetic, the
  ``surfaces.with_grid_xy`` quantization);
* each target cell explodes its (2r+1)^2 ring keys and equi-joins on
  the int64 cell id — neighborhood bounded, never points x cells;
* a JVM window rank over (d2, point_id) cuts each target to its k
  nearest BEFORE any Python runs (WindowGroupLimit pushdown, Arrow
  traffic is k rows per cell);
* one ``applyInPandas`` solves the (m+1)x(m+1) systems — m <= k = 8,
  so the solve is O(1) per cell and embarrassingly parallel.

Exactness: d2 / cell centers are fixed IEEE-double expressions (JVM and
NumPy agree bit-for-bit); neighbor order into the solver is the total
order (d2, point_id); the LAPACK solve of an identical float64 matrix
is deterministic within one machine/BLAS build, and predictions are
quantized to integer micro-units HALF-UP INSIDE the kernel, so the
DuckDB oracle — a sequential NumPy replay of the identical pipeline —
transports exactly (the ``mosaic_fp`` fidelity argument).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import fixture_range
from .registry import register
from .spatial import _pack_cell
from .surfaces import grid_window, with_grid_xy

RES = 13
N = 1 << RES
RING = 2
K = 8
MIN_PTS = 3
NUGGET = 0.1
SILL = 0.9
VRANGE = 0.08  # spherical variogram range, degrees
N_PTS = 1200  # fixed synthetic observation count (SF-independent fixture)
BOX = (10.0, 46.0, 10.6, 46.5)  # lon_min, lat_min, lon_max, lat_max


def gamma(h: np.ndarray) -> np.ndarray:
    """Spherical variogram: 0 at h=0, nugget + sill partial ramp, sill
    plateau beyond the range (the textbook model, float64)."""
    h = np.asarray(h, np.float64)
    r = h / VRANGE
    g = NUGGET + SILL * (1.5 * r - 0.5 * r * r * r)
    g = np.where(h >= VRANGE, NUGGET + SILL, g)
    return np.where(h == 0.0, 0.0, g)


def _ok_solve(lon: np.ndarray, lat: np.ndarray, val: np.ndarray,
              clon: float, clat: float) -> tuple[int, int]:
    """Ordinary-kriging solve over the already-selected neighbors.

    Returns (pred_q, var_q) in integer micro-units, HALF-UP at the
    float64 result — identical in the executor kernel and the replay.
    """
    m = lon.size
    dx = lon[:, None] - lon[None, :]
    dy = lat[:, None] - lat[None, :]
    a = np.zeros((m + 1, m + 1), np.float64)
    a[:m, :m] = gamma(np.sqrt(dx * dx + dy * dy))
    a[m, :m] = 1.0
    a[:m, m] = 1.0
    b = np.empty(m + 1, np.float64)
    b[:m] = gamma(np.sqrt((lon - clon) ** 2 + (lat - clat) ** 2))
    b[m] = 1.0
    w = np.linalg.solve(a, b)
    pred = float(np.dot(w[:m], val))
    kvar = float(np.dot(w, b))  # sum w_i gamma_i0 + mu
    return (int(np.floor(pred * 1e6 + 0.5)), int(np.floor(kvar * 1e6 + 0.5)))


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("tx", T.LongType()),
        T.StructField("ty", T.LongType()),
        T.StructField("n_pts", T.LongType()),
        T.StructField("pred_q", T.LongType()),
        T.StructField("var_q", T.LongType()),
    ]
)


def synthetic_points(spark: SparkSession) -> DataFrame:
    """N_PTS deterministic observations over [10, 12) x [46, 48) — the
    congruential scatter the IDW/spatial suites use, SF-independent so
    the sequential oracle replay is closed-form."""
    return (
        fixture_range(spark, 1, N_PTS + 1)
        .select(F.col("id").alias("point_id"))
        .withColumn("lon", 10.0 + F.pmod(F.col("point_id") * 37, F.lit(2000)) / 1000.0)
        .withColumn("lat", 46.0 + F.pmod(F.col("point_id") * 91, F.lit(2000)) / 1000.0)
        .withColumn("value", F.pmod(F.col("point_id") * 53, F.lit(1000)) / 10.0)
    )


def kriging_grid(points: DataFrame, targets: DataFrame) -> DataFrame:
    """(tx, ty, n_pts, pred_q, var_q): ordinary-kriging estimates at the
    target cell centers from the ring-bounded k nearest observations."""
    pts = with_grid_xy(points, RES).withColumn(
        "cell", _pack_cell(RES, F.col("cell_x"), F.col("cell_y"))
    )
    offsets = [
        (dx, dy) for dx in range(-RING, RING + 1) for dy in range(-RING, RING + 1)
    ]
    ring_keys = (
        targets.select(
            "tx",
            "ty",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.pmod(F.col("tx") + dx, F.lit(N)).alias("rx"),
                            (F.col("ty") + dy).alias("ry"),
                        )
                        for dx, dy in offsets
                    ]
                )
            ).alias("nb"),
        )
        .filter((F.col("nb.ry") >= 0) & (F.col("nb.ry") < N))
        .select("tx", "ty", _pack_cell(RES, F.col("nb.rx"), F.col("nb.ry")).alias("cell"))
    )
    ctr_lon = (F.col("tx") + 0.5) / N * 360.0 - 180.0
    ctr_lat = (F.col("ty") + 0.5) / N * 180.0 - 90.0
    joined = ring_keys.join(pts, "cell").withColumn(
        "d2",
        (F.col("lon") - ctr_lon) * (F.col("lon") - ctr_lon)
        + (F.col("lat") - ctr_lat) * (F.col("lat") - ctr_lat),
    )
    w = Window.partitionBy("tx", "ty").orderBy("d2", "point_id")
    near = joined.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= K)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (tx, ty), g in pdf.groupby(["tx", "ty"], sort=True):
            if len(g) < MIN_PTS:
                continue
            order = np.lexsort(
                (g["point_id"].to_numpy(np.int64), g["d2"].to_numpy(np.float64))
            )
            lon = g["lon"].to_numpy(np.float64)[order]
            lat = g["lat"].to_numpy(np.float64)[order]
            val = g["value"].to_numpy(np.float64)[order]
            clon = (tx + 0.5) / N * 360.0 - 180.0
            clat = (ty + 0.5) / N * 180.0 - 90.0
            pred_q, var_q = _ok_solve(lon, lat, val, clon, clat)
            out.append((tx, ty, len(g), pred_q, var_q))
        cols = ["tx", "ty", "n_pts", "pred_q", "var_q"]
        return pd.DataFrame(out, columns=cols) if out else pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in cols}
        )

    return near.select(
        "tx", "ty", "point_id", "lon", "lat", "value", "d2"
    ).groupBy("tx", "ty").applyInPandas(run, _OUT_SCHEMA)


def replay_rows() -> list[tuple]:
    """Sequential NumPy replay of the identical pipeline (the oracle)."""
    pid = np.arange(1, N_PTS + 1, dtype=np.int64)
    lon = 10.0 + (pid * 37 % 2000) / 1000.0
    lat = 46.0 + (pid * 91 % 2000) / 1000.0
    val = (pid * 53 % 1000) / 10.0
    cx = np.floor((lon + 180.0) / 360.0 * N).astype(np.int64)
    cy = np.floor((lat + 90.0) / 180.0 * N).astype(np.int64)
    xmin, ymin, xmax, ymax = BOX
    tx0, tx1 = int((xmin + 180.0) / 360.0 * N), int((xmax + 180.0) / 360.0 * N)
    ty0, ty1 = int((ymin + 90.0) / 180.0 * N), int((ymax + 90.0) / 180.0 * N)
    rows = []
    for tx in range(tx0, tx1 + 1):
        for ty in range(ty0, ty1 + 1):
            sel = (np.abs(cx - tx) <= RING) & (np.abs(cy - ty) <= RING)
            if sel.sum() < MIN_PTS:
                continue
            clon = (tx + 0.5) / N * 360.0 - 180.0
            clat = (ty + 0.5) / N * 180.0 - 90.0
            plon, plat, pval, ppid = lon[sel], lat[sel], val[sel], pid[sel]
            d2 = (plon - clon) * (plon - clon) + (plat - clat) * (plat - clat)
            order = np.lexsort((ppid, d2))[:K]
            m = order.size
            pred_q, var_q = _ok_solve(
                plon[order], plat[order], pval[order], clon, clat
            )
            rows.append((tx, ty, m, pred_q, var_q))
    return rows


def _kriging_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [
            ("tx", "BIGINT"),
            ("ty", "BIGINT"),
            ("n_pts", "BIGINT"),
            ("pred_q", "BIGINT"),
            ("var_q", "BIGINT"),
        ],
        replay_rows(),
    )


@register("kriging_surface", _kriging_oracle)
def kriging_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-kriging surface of the synthetic scatter over the BOX
    window — prediction and kriging variance per cell, hash-checked
    against the sequential replay of the identical solve."""
    return kriging_grid(synthetic_points(spark), grid_window(spark, RES, *BOX))
