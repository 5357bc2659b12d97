"""Cross-scene histogram matching (radiometric normalization), fully
relational.

Mosaicking scenes from different acquisitions needs their radiometry
aligned before compositing; exact histogram matching maps each scene's
value distribution onto the corpus reference distribution via the
integer quantile rule

    LUT(scene, v) = min r such that cdf_ref(r) >= cdf_scene(v)

evaluated by EXACT cross-multiplication ``cum_ref(r) * n_scene >=
cum_scene(v) * n_ref`` — no division, no floats, so Spark and DuckDB
agree bit-for-bit.  (``equalize_mosaic`` is the self-referential special
case where the reference CDF is uniform; this operator matches ARBITRARY
empirical references — the pairwise normalization step the reference
repo's pyramid assumes has already happened upstream.)

Spark-first shape: two grouped histograms (map-side combinable), two
window cumsums (the per-scene one partitioned by scene — bounded by the
value-domain width, <= 64 rows per scene; the reference one a single
bounded-domain partition, the ``ap_stats`` pattern), and one theta join
of scene-histogram rows against the BROADCAST <=64-row reference
histogram followed by ``min(r)``.  Nothing scales with pixel count but
the first histogram pass.

Fixture: per-event values ``(event_id * 7) % (32 + scene % 33)`` — the
modulus varies by scene, so scene supports genuinely differ from the
corpus mixture and the LUT is non-trivial (pinned by pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

N_SCENES = 200


def _scene_values(events: DataFrame) -> DataFrame:
    e = F.col("event_id").cast("long")
    return events.select(
        F.pmod(e, F.lit(N_SCENES)).alias("scene"),
        F.pmod(e * 7, F.lit(32) + F.pmod(e, F.lit(N_SCENES)) % 33).alias("v"),
    )


def hist_match_lut(values: DataFrame) -> DataFrame:
    """(scene, v, mapped) — the exact matching LUT of every scene
    against the corpus-wide reference histogram."""
    sh = values.groupBy("scene", "v").agg(F.count("*").alias("c"))
    w_s = (
        Window.partitionBy("scene")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sc = sh.select(
        "scene",
        "v",
        F.sum("c").over(w_s).alias("cum_s"),
        F.sum("c").over(Window.partitionBy("scene")).alias("n_s"),
    )
    rh = values.groupBy("v").agg(F.count("*").alias("c"))
    # bounded-domain cumulative: <= 64 rows in one partition — by design
    w_r = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    rc = rh.select(
        F.col("v").alias("r"),
        F.sum("c").over(w_r).alias("cum_r"),
        F.sum("c").over(Window.partitionBy()).alias("n_r"),
    )
    j = sc.join(
        F.broadcast(rc),
        F.col("cum_r") * F.col("n_s") >= F.col("cum_s") * F.col("n_r"),
    )
    return j.groupBy("scene", "v").agg(F.min("r").alias("mapped"))


_HM_ORACLE = f"""
WITH src AS (
  SELECT event_id % {N_SCENES} AS scene,
         (event_id * 7) % (32 + (event_id % {N_SCENES}) % 33) AS v
  FROM events),
sh AS (SELECT scene, v, COUNT(*) AS c FROM src GROUP BY 1, 2),
sc AS (SELECT scene, v,
        SUM(c) OVER (PARTITION BY scene ORDER BY v) AS cum_s,
        SUM(c) OVER (PARTITION BY scene) AS n_s
       FROM sh),
rh AS (SELECT v, COUNT(*) AS c FROM src GROUP BY 1),
rc AS (SELECT v AS r,
        SUM(c) OVER (ORDER BY v) AS cum_r,
        SUM(c) OVER () AS n_r
       FROM rh)
SELECT s.scene AS scene, s.v AS v, CAST(MIN(c.r) AS BIGINT) AS mapped
FROM sc s JOIN rc c ON c.cum_r * s.n_s >= s.cum_s * c.n_r
GROUP BY 1, 2"""


@register("hist_match_lut", _HM_ORACLE)
def hist_match_lut_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-scene histogram-matching LUT against the corpus
    reference; the oracle runs the identical cross-multiplied quantile
    rule in DuckDB."""
    return hist_match_lut(
        _scene_values(load_table(spark, sf_dir, "events"))
    )
