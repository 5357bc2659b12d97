"""Geostatistics: empirical (semi)variogram and Ripley's K function.

The two workhorse second-order statistics of spatial analysis:

* **Empirical variogram** gamma(h) = (1 / 2|N(h)|) * sum (z_i - z_j)^2
  over point pairs binned by separation distance — the kriging precursor
  (every kriging run fits a model to exactly this table) and the
  spatial-correlation diagnostic.  This operator computes the distributed
  99% of kriging: the per-lag pair counts and squared-difference sums;
  model fitting is driver-side on the ~10-row result.
* **Ripley's K** K(r) proportional to the count of pairs within r, for a
  ladder of radii — the point-pattern clustering test (K above the CSR
  line = clustered, below = dispersed).

Spark-first shape (shared by both): the pair generator is ONE
cell-bucketed self-join, never all-pairs — points land in integer grid
cells of pitch = max lag, the LEFT side explodes to its 3x3 cell
neighborhood (a 9-row JVM ``explode`` of a literal offset array), the
join is a single equi-join on the cell key, and each unordered pair
meets exactly once because the pair is kept only when
``exploded.point_id < home.point_id`` (the (j, i) meeting fails the
filter; no DISTINCT needed).  At web scale the join cost is true pair
density within the lag range, the same boundedness argument as
``pip_cell_join`` / ``radius_pairs``; a hot cell salts identically.

Exactness: coordinates and values are integers (meters / quantized z),
so d^2 and (z_i - z_j)^2 are exact int64.  The only float op is
``FLOOR(SQRT(d2))`` for the lag bin — IEEE-754 sqrt is correctly
rounded and d2 < 2^52, so floor agrees bit-for-bit across engines
(and cannot straddle an integer: for k <= 10^6, sqrt(k^2 - 1) is more
than one ULP below k).

Fixture: points from customer keys on a 2 km integer field with a
spatially-correlated value — a linear drift plus key-hash noise — so
gamma(h) genuinely RISES with h (drift dominates noise at long lags)
and the variogram is scientifically non-vacuous, asserted in tests.

Oracles: full generative DuckDB SQL twins over the same parquet
(bucketed join replayed with a VALUES offset table), scaling with
sf_dir.  Reference context: the reference carries CRS/grid geometry
(`data_api/geozarr/common.py`) but no spatial statistics; these extend
the engine's spatial-join family (SURVEY §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

R_MAX = 500  # max lag / max K radius, meters
N_BINS = 10  # variogram lag bins of width R_MAX / N_BINS
K_RADII = (100, 200, 300, 400, 500)  # Ripley K ladder


def field_points(customer: DataFrame) -> DataFrame:
    """(point_id, px, py, z): integer 2 km field with drift + noise."""
    return customer.selectExpr(
        "c_custkey AS point_id",
        "c_custkey * 37 % 2000 AS px",
        "c_custkey * 91 % 2000 AS py",
        # drift (px+py)/10 spans 0..400; noise spans 0..40: correlated field
        "(c_custkey * 37 % 2000 + c_custkey * 91 % 2000) DIV 10"
        " + c_custkey * 53 % 41 AS z",
    )


def _pairs(points: DataFrame, r_max: int = R_MAX) -> DataFrame:
    """Unordered point pairs with d2 <= r_max^2, met exactly once.

    Cell pitch r_max; left side exploded to the 3x3 neighborhood, right
    side at its home cell; kept iff left.point_id < right.point_id.

    The home side is round-robin repartitioned to the session's shuffle
    width before the join: the planner broadcasts the (narrow) exploded
    probe side, so the quadratic within-cell refine runs at the HOME
    side's parallelism — which from a single parquet file is 1-2 scan
    partitions, serializing ~10^8 candidate evaluations onto two cores.
    One narrow-row exchange buys full-width parallelism; at cluster
    scale, where the probe side outgrows the broadcast threshold, the
    planner falls back to the keyed shuffle join and AQE's skew splitting
    takes over (guide §2.5/§3.1).
    """
    width = int(points.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    home = points.selectExpr(
        "point_id AS id_b", "px AS bx", "py AS by", "z AS zb",
        f"px DIV {r_max} AS cx", f"py DIV {r_max} AS cy",
    ).repartition(width)
    probe = (
        points.withColumn("dx", F.explode(F.expr("array(-1, 0, 1)")))
        .withColumn("dy", F.explode(F.expr("array(-1, 0, 1)")))
        .selectExpr(
            "point_id AS id_a", "px AS ax", "py AS ay", "z AS za",
            f"px DIV {r_max} + dx AS cx", f"py DIV {r_max} + dy AS cy",
        )
    )
    return (
        probe.join(home, ["cx", "cy"])
        .where("id_a < id_b")
        .selectExpr(
            "id_a", "id_b",
            "(ax - bx) * (ax - bx) + (ay - by) * (ay - by) AS d2",
            "(za - zb) * (za - zb) AS sqdiff",
        )
        .where(f"d2 <= {r_max * r_max} AND d2 > 0")
    )


def empirical_variogram(points: DataFrame, r_max: int = R_MAX,
                        n_bins: int = N_BINS) -> DataFrame:
    """(lag_bin, n_pairs, sum_sqdiff): exact variogram numerators.

    gamma(h) = sum_sqdiff / (2 * n_pairs) for lag bin h; bin width
    r_max / n_bins; coincident points (d2 = 0) excluded per convention.
    """
    return (
        _pairs(points, r_max)
        .selectExpr(
            f"CAST(FLOOR(SQRT(CAST(d2 AS DOUBLE))) AS BIGINT)"
            f" * {n_bins} DIV {r_max} AS lag_bin",
            "sqdiff",
        )
        .groupBy("lag_bin")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("sqdiff").alias("sum_sqdiff"),
        )
    )


def ripley_k_counts(points: DataFrame, radii=K_RADII) -> DataFrame:
    """(radius, n_pairs): unordered pair counts within each radius.

    K_hat(r) = area * 2 * n_pairs / n^2 (driver-side, given the study
    area); the distributed part is exactly these counts.  One pass over
    the shared pair join evaluates the whole ladder.
    """
    pairs = _pairs(points, max(radii))
    from ..sources.tables import local_df

    radii_df = local_df(
        pairs.sparkSession, [(int(r),) for r in sorted(radii)], "radius long"
    )
    return (
        pairs.crossJoin(F.broadcast(radii_df))
        .where("d2 <= radius * radius")
        .groupBy("radius")
        .agg(F.count("*").alias("n_pairs"))
    )


_PTS_SQL = """
pts AS (
  SELECT c_custkey AS point_id,
         c_custkey * 37 % 2000 AS px,
         c_custkey * 91 % 2000 AS py,
         (c_custkey * 37 % 2000 + c_custkey * 91 % 2000) // 10
           + c_custkey * 53 % 41 AS z
  FROM customer),
probe AS (
  SELECT point_id AS id_a, px AS ax, py AS ay, z AS za,
         px // {r} + o1.k AS cx, py // {r} + o2.k AS cy
  FROM pts, (VALUES (-1), (0), (1)) AS o1(k), (VALUES (-1), (0), (1)) AS o2(k)),
home AS (
  SELECT point_id AS id_b, px AS bx, py AS by, z AS zb,
         px // {r} AS cx, py // {r} AS cy
  FROM pts),
pairs AS (
  SELECT id_a, id_b,
         (ax - bx) * (ax - bx) + (ay - by) * (ay - by) AS d2,
         (za - zb) * (za - zb) AS sqdiff
  FROM probe JOIN home USING (cx, cy)
  WHERE id_a < id_b)
"""


def _variogram_oracle() -> str:
    return (
        "WITH " + _PTS_SQL.format(r=R_MAX).lstrip() +
        f"""
SELECT CAST(FLOOR(SQRT(CAST(d2 AS DOUBLE))) AS BIGINT) * {N_BINS} // {R_MAX}
         AS lag_bin,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(sqdiff) AS BIGINT) AS sum_sqdiff
FROM pairs
WHERE d2 <= {R_MAX * R_MAX} AND d2 > 0
GROUP BY 1"""
    )


def _ripley_oracle() -> str:
    radii_vals = ", ".join(f"({r})" for r in sorted(K_RADII))
    return (
        "WITH " + _PTS_SQL.format(r=max(K_RADII)).lstrip() +
        f""",
radii(radius) AS (VALUES {radii_vals})
SELECT CAST(radius AS BIGINT) AS radius,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs, radii
WHERE d2 <= radius * radius AND d2 > 0
GROUP BY radius"""
    )


@register("empirical_variogram", _variogram_oracle())
def empirical_variogram_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-lag variogram numerators over the correlated customer
    field — the distributed stage of every kriging run."""
    return empirical_variogram(field_points(load_table(spark, sf_dir, "customer")))


@register("ripley_k", _ripley_oracle())
def ripley_k_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K pair counts for a 5-radius ladder over the customer
    field — the point-pattern clustering test's distributed stage."""
    return ripley_k_counts(field_points(load_table(spark, sf_dir, "customer")))
