"""Surface estimation from scattered points: IDW interpolation, KDE heatmaps.

Point observations -> a regular cell-grid raster, the gridding step of
"make a continuous field from in-situ / GCP-like samples" (the reference
interpolates scattered GCP grids onto pixel grids for reprojection,
``src/eopf_geozarr/conversion/geozarr.py`` GCP handling; this module is the
same scatter->grid move expressed as a bucketed Spark join).

Scale design: the naive formulation is a points x grid-cells cross join —
quadratic, never acceptable.  Both operators here bound the neighborhood by
a k-ring in cell space: points are keyed by their containing cell (pure JVM
floor arithmetic), each target cell explodes its (2r+1)^2 ring keys, and an
equi-join on the int64 cell key brings exactly the local points to each
target.  Cost is output_cells * ring^2 + points, one shuffle, no UDFs; the
ring table broadcasts when the target window is small, and at continental
target grids the equi-join co-partitions with the points' own cell
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .spatial import _pack_cell
from ..sources.tables import fixture_range


def with_grid_xy(
    points: DataFrame, res: int, lon="lon", lat="lat"
) -> DataFrame:
    """Containing cell column indices via JVM floor arithmetic (no UDF).

    Same quantization as ``cells.cell_of`` for in-range coordinates;
    callers that need the clamped antimeridian/pole behavior should use
    ``with_point_cell`` (pandas-UDF path) instead.
    """
    n = 1 << res
    return points.withColumn(
        "cell_x", F.floor((F.col(lon) + 180.0) / 360.0 * n)
    ).withColumn("cell_y", F.floor((F.col(lat) + 90.0) / 180.0 * n))


def grid_window(
    spark, res: int, lon_min: float, lat_min: float, lon_max: float, lat_max: float
) -> DataFrame:
    """Enumerate the target cells of a bbox window, distributed.

    The window's column/row ranges derive from the same floor quantization
    as the point keying; the two-level ``sequence`` explode keeps the
    enumeration JVM-side and output-proportional.
    """
    n = 1 << res
    tx0 = int((lon_min + 180.0) / 360.0 * n)
    tx1 = int((lon_max + 180.0) / 360.0 * n)
    ty0 = int((lat_min + 90.0) / 180.0 * n)
    ty1 = int((lat_max + 90.0) / 180.0 * n)
    return (
        fixture_range(spark, tx0, tx1 + 1)
        .select(F.col("id").alias("tx"))
        .withColumn("ty", F.explode(F.sequence(F.lit(ty0), F.lit(ty1))))
    )


def idw_grid(
    points: DataFrame,
    targets: DataFrame,
    res: int,
    ring: int = 1,
    power_eps: float = 1e-6,
    value_col: str = "value",
) -> DataFrame:
    """Inverse-distance-weighted interpolation onto grid cell centers.

    For each target cell (tx, ty), the estimate is
    ``sum(w_i * v_i) / sum(w_i)`` over the points whose containing cell
    lies within Chebyshev distance ``ring`` of the target, with
    ``w_i = 1 / (d2_i + power_eps)`` and ``d2_i`` the squared planar
    degree distance from the point to the cell center.  Targets with no
    points in the neighborhood are absent from the output (no
    extrapolation from an empty window).

    ``points`` needs (lon, lat, value_col); ``targets`` needs (tx, ty)
    (see ``grid_window``).  Returns (tx, ty, idw_value, n_pts).
    """
    n = 1 << res
    pts = with_grid_xy(points, res).withColumn(
        "cell", _pack_cell(res, F.col("cell_x"), F.col("cell_y"))
    )
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    ring_keys = targets.select(
        "tx",
        "ty",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.pmod(F.col("tx") + dx, F.lit(n)).alias("rx"),
                        (F.col("ty") + dy).alias("ry"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("nb"),
    ).filter((F.col("nb.ry") >= 0) & (F.col("nb.ry") < n)).select(
        "tx", "ty", _pack_cell(res, F.col("nb.rx"), F.col("nb.ry")).alias("cell")
    )
    # cell-center coordinates in degrees — the same quantization inverted
    ctr_lon = (F.col("tx") + 0.5) / n * 360.0 - 180.0
    ctr_lat = (F.col("ty") + 0.5) / n * 180.0 - 90.0
    joined = ring_keys.join(pts, "cell").withColumn(
        "_d2",
        (F.col("lon") - ctr_lon) * (F.col("lon") - ctr_lon)
        + (F.col("lat") - ctr_lat) * (F.col("lat") - ctr_lat),
    ).withColumn("_w", 1.0 / (F.col("_d2") + F.lit(power_eps)))
    return joined.groupBy("tx", "ty").agg(
        (F.sum(F.col("_w") * F.col(value_col)) / F.sum("_w")).alias("idw_value"),
        F.count(F.lit(1)).alias("n_pts"),
    )


def kde_grid(
    points: DataFrame,
    targets: DataFrame,
    res: int,
    bandwidth: float,
    ring: int = 1,
) -> DataFrame:
    """Kernel density estimate onto grid cell centers (heatmap).

    Epanechnikov kernel ``max(0, 1 - d2/h^2)`` — pure +-*/ arithmetic, so
    the engine and a SQL oracle evaluate the IDENTICAL IEEE-754 doubles
    (no transcendental libm divergence, the reason this is Epanechnikov
    and not Gaussian).  Each point's contribution is quantized to integer
    micro-units BEFORE the sum, making the aggregate an order-independent
    int64 — hash-exact at any parallelism, no float tolerance.

    The neighborhood is the same Chebyshev cell ring as ``idw_grid``
    (truncation at the ring edge is part of the defined semantics; choose
    ``bandwidth`` <= ring * cell height for full support).  Cost is
    output_cells * ring^2 + points — never points x cells.
    Returns (tx, ty, n_pts, dens_q).
    """
    n = 1 << res
    pts = with_grid_xy(points, res).withColumn(
        "cell", _pack_cell(res, F.col("cell_x"), F.col("cell_y"))
    )
    offsets = [(dx, dy) for dx in range(-ring, ring + 1) for dy in range(-ring, ring + 1)]
    ring_keys = targets.select(
        "tx",
        "ty",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.pmod(F.col("tx") + dx, F.lit(n)).alias("rx"),
                        (F.col("ty") + dy).alias("ry"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("nb"),
    ).filter((F.col("nb.ry") >= 0) & (F.col("nb.ry") < n)).select(
        "tx", "ty", _pack_cell(res, F.col("nb.rx"), F.col("nb.ry")).alias("cell")
    )
    ctr_lon = (F.col("tx") + 0.5) / n * 360.0 - 180.0
    ctr_lat = (F.col("ty") + 0.5) / n * 180.0 - 90.0
    h2 = bandwidth * bandwidth
    joined = ring_keys.join(pts, "cell").withColumn(
        "_d2",
        (F.col("lon") - ctr_lon) * (F.col("lon") - ctr_lon)
        + (F.col("lat") - ctr_lat) * (F.col("lat") - ctr_lat),
    ).withColumn(
        "_kq",
        F.floor(
            F.greatest(F.lit(0.0), 1.0 - F.col("_d2") / F.lit(h2)) * 1e6 + 0.5
        ).cast("long"),
    )
    return joined.groupBy("tx", "ty").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum("_kq").alias("dens_q"),
    )
