"""Standard deviational ellipse: directional distribution per group.

The classic centrographic summary (ArcGIS "Directional Distribution"):
per group, the mean center plus the semi-axes of the 1-sigma ellipse —
the eigenvalues of the 2x2 coordinate covariance matrix, which have the
closed form

    lambda = (vx + vy)/2 +- sqrt(((vx - vy)/2)^2 + cov^2)

so the whole statistic is one aggregation pass: +-*/ and sqrt only (no
eigensolver, no transcendental divergence; the orientation angle would
need atan2 and is deliberately NOT emitted — the axes carry the shape).
Catalog use: how elongated / oriented is each event-type's spatial
footprint, the one-row-per-group screen before trajectory or corridor
analysis.

Exactness: coordinates are the integer milli-degree offsets of the
congruential scatter, so every sum of moments (n, sx, sy, sxx, syy,
sxy) is an exact int64 aggregation — order-independent at any
parallelism — and the final doubles are fixed IEEE expressions over
those ints, quantized micro HALF-UP for transport.  The oracle is
GENERATIVE DuckDB SQL over the identical expression tree.

Scale: one map-side-combinable groupBy over the scan; group count =
distinct event types.  At 10^12 rows this is the cheapest possible
shape (partial aggregation, constant rows per task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register


def sde_per_group(points: DataFrame, group_col: str = "event_type") -> DataFrame:
    """(group, n, mx_q, my_q, maj_q, min_q): mean center (micro
    milli-degrees) and 1-sigma semi-axes of the deviational ellipse.

    ``points`` needs integer coordinate columns ``xm``/``ym``
    (milli-degree offsets) and ``group_col``.
    """
    agg = points.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").alias("sx"),
        F.sum("ym").alias("sy"),
        F.sum(F.col("xm") * F.col("xm")).alias("sxx"),
        F.sum(F.col("ym") * F.col("ym")).alias("syy"),
        F.sum(F.col("xm") * F.col("ym")).alias("sxy"),
    )
    nn = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nn
    my = F.col("sy").cast("double") / nn
    vx = F.col("sxx").cast("double") / nn - mx * mx
    vy = F.col("syy").cast("double") / nn - my * my
    cv = F.col("sxy").cast("double") / nn - mx * my
    half = (vx - vy) / F.lit(2.0)
    root = F.sqrt(half * half + cv * cv)
    mid = (vx + vy) / F.lit(2.0)
    lam1 = mid + root
    lam2 = F.greatest(F.lit(0.0), mid - root)
    q = lambda c: F.floor(c * 1e6 + 0.5).cast("long")  # noqa: E731
    return agg.select(
        "grp",
        "n",
        q(mx).alias("mx_q"),
        q(my).alias("my_q"),
        q(F.sqrt(lam1)).alias("maj_q"),
        q(F.sqrt(lam2)).alias("min_q"),
    )


_ORACLE = """
WITH pts AS (
  SELECT event_type AS grp,
         event_id * 37 % 2000 AS xm,
         event_id * 91 % 2000 AS ym
  FROM events),
a AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xm) AS BIGINT) AS sx, CAST(SUM(ym) AS BIGINT) AS sy,
         CAST(SUM(xm * xm) AS BIGINT) AS sxx,
         CAST(SUM(ym * ym) AS BIGINT) AS syy,
         CAST(SUM(xm * ym) AS BIGINT) AS sxy
  FROM pts GROUP BY grp)
SELECT grp, n,
  CAST(FLOOR(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS mx_q,
  CAST(FLOOR(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS my_q,
  CAST(FLOOR(sqrt(
      ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
       + (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) / 2.0
      + sqrt(
          ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            - (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) / 2.0)
          * ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            - (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) / 2.0)
          + (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
          * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
    ) * 1e6 + 0.5) AS BIGINT) AS maj_q,
  CAST(FLOOR(sqrt(GREATEST(0.0,
      ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
       + (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
        - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) / 2.0
      - sqrt(
          ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            - (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) / 2.0)
          * ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            - (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))) / 2.0)
          + (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
          * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))))
    )) * 1e6 + 0.5) AS BIGINT) AS min_q
FROM a
"""


@register("sde_ellipse", _ORACLE)
def sde_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse per event type over the congruential
    scatter — exact integer moments, closed-form eigen semi-axes."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    pts = ev.select(
        "event_type",
        F.pmod(F.col("event_id") * 37, F.lit(2000)).alias("xm"),
        F.pmod(F.col("event_id") * 91, F.lit(2000)).alias("ym"),
    )
    return sde_per_group(pts)
