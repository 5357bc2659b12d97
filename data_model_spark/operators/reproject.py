"""GCP-based scene reprojection as a Spark operator (SURVEY §2.8 R1/R2).

The reference warps each Sentinel-1 polarization from radar geometry to an
EPSG:4326 grid using a ground-control-point grid
(`conversion/sentinel1_reprojection.py:20-108`; per-band kernel
`:277-329`). Spark expression:

* measurements are long-format rows ``(pol, line, pixel, grd)`` — the tall
  twin of the chunked radar raster (FIXTURES.md §3);
* the GCP grid (~10x21 rows) is broadcast — carried in the UDF closure,
  the degenerate broadcast join the reference's "GCP <-> measurement
  association" is (SURVEY §2.3 J3);
* ``groupBy(pol).applyInPandas`` rebuilds the 2-D array per polarization,
  fits the inverse polynomial, warps, and emits long-format output — the
  per-band parallel granularity the reference's dask graph uses; at
  10^12-image scale the fleet parallelism is across scenes/polarizations,
  each warp a single vectorized NumPy call.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import warp
from ..sources.tables import local_df
from .registry import register

WARPED_SCHEMA = T.StructType(
    [
        T.StructField("pol", T.StringType(), False),
        T.StructField("row", T.IntegerType(), False),
        T.StructField("col", T.IntegerType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)


def reproject_gcp(
    meas: DataFrame,
    gcps: pd.DataFrame,
    src_width: int,
    src_height: int,
    nodata: float = 65535.0,
    order: int = 1,
) -> DataFrame:
    """Warp long-format measurements to EPSG:4326, one group per ``pol``.

    ``gcps``: pandas DataFrame (line, pixel, latitude, longitude) — small,
    rides in the closure (broadcast).  Output keeps only valid (non-nodata)
    cells, long format.
    """
    g_line = gcps["line"].to_numpy()
    g_pixel = gcps["pixel"].to_numpy()
    g_lat = gcps["latitude"].to_numpy()
    g_lon = gcps["longitude"].to_numpy()

    def warp_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pol = pdf["pol"].iloc[0]
        src = np.full((src_height, src_width), nodata, dtype=np.float64)
        src[pdf["line"].to_numpy(), pdf["pixel"].to_numpy()] = pdf["grd"].to_numpy()
        out, lons, lats = warp.warp_gcp(
            src, g_line, g_pixel, g_lat, g_lon, nodata=nodata, order=order
        )
        rows, cols = np.nonzero(
            ~np.isnan(out) if np.isnan(nodata) else out != nodata
        )
        return pd.DataFrame(
            {
                "pol": pol,
                "row": rows.astype(np.int32),
                "col": cols.astype(np.int32),
                "lon": lons[cols],
                "lat": lats[rows],
                "value": out[rows, cols],
            }
        )

    return meas.groupBy("pol").applyInPandas(warp_one, WARPED_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic synthetic S1 scene (FIXTURES.md §3, scaled)
# ---------------------------------------------------------------------------

S1_W, S1_H = 128, 72
S1_NODATA = 65535.0


def s1_value(line, pixel):
    """Deterministic grd value — recomputable oracle-side (uint16 < 200)."""
    return (np.asarray(line) * 7 + np.asarray(pixel) * 13) % 200


def synth_s1_gcps(n_lines: int = 7, n_pixels: int = 9) -> pd.DataFrame:
    """Linear GCP grid like the reference fixture
    (`tests/test_integration_sentinel1.py:84-97`): lat 39..41, lon 15..18."""
    ll, pp = np.meshgrid(
        np.linspace(0, S1_H - 1, n_lines), np.linspace(0, S1_W - 1, n_pixels),
        indexing="ij",
    )
    return pd.DataFrame(
        {
            "line": ll.ravel().astype(np.int64),
            "pixel": pp.ravel().astype(np.int64),
            "latitude": 39.0 + 2.0 * ll.ravel() / (S1_H - 1),
            "longitude": 15.0 + 3.0 * pp.ravel() / (S1_W - 1),
            "height": 0.0,
        }
    )


def synth_s1_measurements(spark) -> DataFrame:
    """Distributed long-format scene: 2 polarizations x 72 x 128."""
    n = S1_W * S1_H

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            pol_idx, cell = np.divmod(idx, n)
            line, pixel = np.divmod(cell, S1_W)
            yield pd.DataFrame(
                {
                    "pol": np.where(pol_idx == 0, "VV", "VH"),
                    "line": line.astype(np.int64),
                    "pixel": pixel.astype(np.int64),
                    "grd": np.where(
                        pol_idx == 0, s1_value(line, pixel), s1_value(pixel, line)
                    ).astype(np.int64),
                }
            )

    schema = "pol string, line long, pixel long, grd long"
    return spark.range(0, 2 * n, numPartitions=8).mapInPandas(gen, schema)


@register("gcp_warp", None)  # NumPy-exact golden in tests/test_warp.py
def gcp_warp(spark, sf_dir):
    """R1 warp query: per-polarization summary of the reprojected scene."""
    meas = synth_s1_measurements(spark)
    out = reproject_gcp(meas, synth_s1_gcps(), S1_W, S1_H, nodata=S1_NODATA)
    return (
        out.groupBy("pol")
        .agg(
            F.count("*").alias("n_valid"),
            F.round(F.sum("value"), 3).alias("sum_value"),
            F.round(F.min("lat"), 6).alias("lat_min"),
            F.round(F.max("lat"), 6).alias("lat_max"),
            F.round(F.min("lon"), 6).alias("lon_min"),
            F.round(F.max("lon"), 6).alias("lon_max"),
        )
        .orderBy("pol")
    )


def overview_gcps(g: DataFrame, factor: float) -> DataFrame:
    """A11 on real GCPs: overview-level GCP grid via scale+round+group-mean
    (`conversion/utils.py:261-298`).

    F.bround = HALF_EVEN, matching the reference's np.round; F.round
    (HALF_UP) diverges on odd half-integers (5/2=2.5 -> np 2, HALF_UP 3).
    """
    return (
        g.groupBy(
            F.bround(g.line / factor).cast("long").alias("line"),
            F.bround(g.pixel / factor).cast("long").alias("pixel"),
        )
        .agg(
            F.round(F.avg("latitude"), 9).alias("latitude"),
            F.round(F.avg("longitude"), 9).alias("longitude"),
            F.round(F.avg("height"), 9).alias("height"),
        )
        .orderBy("line", "pixel")
    )


def _gcp_overview_oracle() -> str:
    """The scale+round-half-even+group-mean replayed in SQL over the inlined
    deterministic GCP grid (DuckDB round_even == Spark bround == np.round)."""
    pdf = synth_s1_gcps()
    vals = ", ".join(
        f"({int(r.line)}, {int(r.pixel)}, {float(r.latitude)!r},"
        f" {float(r.longitude)!r}, {float(r.height)!r})"
        for r in pdf.itertuples()
    )
    return f"""
WITH g(line, pixel, latitude, longitude, height) AS (VALUES {vals})
SELECT CAST(round_even(line / 2.0, 0) AS BIGINT) AS line,
       CAST(round_even(pixel / 2.0, 0) AS BIGINT) AS pixel,
       ROUND(AVG(latitude), 9) AS latitude,
       ROUND(AVG(longitude), 9) AS longitude,
       ROUND(AVG(height), 9) AS height
FROM g GROUP BY 1, 2"""


@register("gcp_overview_gcps", _gcp_overview_oracle)
def gcp_overview_gcps(spark, sf_dir):
    """Registered /2-overview GCP grid for the synthetic S1 scene."""
    g = local_df(
        spark,
        synth_s1_gcps(),
        "line long, pixel long, latitude double, longitude double, height double",
    )
    return overview_gcps(g, 2.0)


# ---------------------------------------------------------------------------
# oracle twin: the full warp, driver-hash-checked
#
# ``gcp_warp`` is rows-only because its per-pol summary sums doubles whose
# accumulation order Spark does not fix.  The twin runs the IDENTICAL
# distributed warp (same synthetic scene, same ``reproject_gcp`` plan) but
# fingerprints with order-independent quantities only: counts, integer
# row/col sums, per-element HALF_UP value millis (integer sum), and
# min/max extents — all replayable bit-exactly by a sequential pass
# through the same ``functions/warp.py`` kernel.
# ---------------------------------------------------------------------------


def _warp_fp_agg(out: DataFrame) -> DataFrame:
    vmilli = F.round(out["value"] * F.lit(1000.0), 0).cast("long")
    return (
        out.groupBy("pol")
        .agg(
            F.count("*").alias("n_valid"),
            F.sum("row").alias("row_sum"),
            F.sum("col").alias("col_sum"),
            F.sum(vmilli).alias("value_milli_sum"),
            F.round(F.min("lat"), 6).alias("lat_min"),
            F.round(F.max("lat"), 6).alias("lat_max"),
            F.round(F.min("lon"), 6).alias("lon_min"),
            F.round(F.max("lon"), 6).alias("lon_max"),
        )
        .orderBy("pol")
    )


def _gcp_warp_fp_oracle() -> str:
    from .mosaic_fp import _r, _values_sql

    gc = synth_s1_gcps()
    g_line, g_pixel = gc["line"].to_numpy(), gc["pixel"].to_numpy()
    g_lat, g_lon = gc["latitude"].to_numpy(), gc["longitude"].to_numpy()
    line, pixel = np.divmod(np.arange(S1_H * S1_W, dtype=np.int64), S1_W)
    rows_out = []
    for pol in ("VH", "VV"):
        grd = s1_value(pixel, line) if pol == "VH" else s1_value(line, pixel)
        src = np.full((S1_H, S1_W), S1_NODATA, dtype=np.float64)
        src[line, pixel] = grd
        out, lons, lats = warp.warp_gcp(
            src, g_line, g_pixel, g_lat, g_lon, nodata=S1_NODATA, order=1
        )
        rr, cc = np.nonzero(out != S1_NODATA)
        vals = out[rr, cc]
        rows_out.append(
            (
                pol,
                int(rr.size),
                int(rr.astype(np.int64).sum()),
                int(cc.astype(np.int64).sum()),
                int(sum(int(_r(float(v) * 1000.0, 0)) for v in vals)),
                _r(float(lats[rr].min()), 6),
                _r(float(lats[rr].max()), 6),
                _r(float(lons[cc].min()), 6),
                _r(float(lons[cc].max()), 6),
            )
        )
    return _values_sql(
        [
            ("pol", "VARCHAR"),
            ("n_valid", "BIGINT"),
            ("row_sum", "BIGINT"),
            ("col_sum", "BIGINT"),
            ("value_milli_sum", "BIGINT"),
            ("lat_min", "DOUBLE"),
            ("lat_max", "DOUBLE"),
            ("lon_min", "DOUBLE"),
            ("lon_max", "DOUBLE"),
        ],
        rows_out,
    )


@register("gcp_warp_fp", _gcp_warp_fp_oracle)
def gcp_warp_fp(spark, sf_dir):
    """``gcp_warp``'s oracle twin: identical distributed warp plan over the
    synthetic S1 scene, hash-checked against the sequential ``warp_gcp``
    replay via order-independent integer/extent fingerprints."""
    meas = synth_s1_measurements(spark)
    out = reproject_gcp(meas, synth_s1_gcps(), S1_W, S1_H, nodata=S1_NODATA)
    return _warp_fp_agg(out)
