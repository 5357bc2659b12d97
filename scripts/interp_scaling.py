"""Two-parallelism scaling probe for the round-5 late waves — the
interpolation / local-statistics / stencil families added in waves
14-17 (kriging, KDE + Gi*, GLCM texture, cloud-shadow stencil).

The north-rule N vs 4N protocol (same input, local[2] vs local[8]
physical-core regime, interleaved rounds, medians) applied to the two
plan shapes these operators use:

* ring-bucketed cell joins + grouped solves (kriging / kde / hotspot)
  at a 170x point fixture over a ~4100-cell window;
* per-tile kernels over the full scene tile table (glcm map-only;
  shadow radius-4 halo exchange) at a 64x scene fixture.

Usage: python scripts/interp_scaling.py CORES [ROUND_TAG]
Prints one JSON line; orchestrated by interp_scaling.sh.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PTS = int(os.environ.get("SPARK_GRAFT_INTERP_PTS", "2000000"))
N_PTS_AGG = int(os.environ.get("SPARK_GRAFT_INTERP_AGG_PTS", "20000000"))
N_SCENES = int(os.environ.get("SPARK_GRAFT_INTERP_SCENES", "1536"))
BOX = (10.0, 46.0, 12.0, 48.0)  # the full congruential scatter extent


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    round_tag = sys.argv[2] if len(sys.argv) > 2 else "0"

    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.operators.hotspot import cell_counts, local_stats
    from data_model_spark.operators.kriging import RES, kriging_grid
    from data_model_spark.operators.shadow import shadow_tiles
    from data_model_spark.operators.surfaces import grid_window, kde_grid
    from data_model_spark.operators.texture import texture_tiles
    from data_model_spark.session import get_spark
    from data_model_spark.sources.images import generate_images_df

    spark = get_spark(
        cores=cores,
        app_name=f"interp-scaling-{cores}",
        shuffle_partitions=max(2 * cores, 8),
        extra_conf={"spark.local.dir": f"/dev/shm/spark-local-interp-{cores}"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def points(n):
        return (
            spark.range(1, n + 1)
            .select(F.col("id").alias("point_id"))
            .withColumn(
                "lon", 10.0 + F.pmod(F.col("point_id") * 37, F.lit(n)) * (2.0 / n)
            )
            .withColumn(
                "lat", 46.0 + F.pmod(F.col("point_id") * 91, F.lit(n)) * (2.0 / n)
            )
            .withColumn("value", F.pmod(F.col("point_id") * 53, F.lit(1000)) / 10.0)
        )

    def tiles():
        images = generate_images_df(spark, N_SCENES)
        return tiling.merge_tiles(
            tiling.build_tiles(images, repartition=False)
        ).filter(F.col("level") == 0)

    timings: dict[str, float] = {}

    def run(name, fn):
        t0 = time.perf_counter()
        n = fn().count()
        timings[name] = round(time.perf_counter() - t0, 3)
        return n

    targets = grid_window(spark, RES, *BOX)
    n_cells = run("kriging", lambda: kriging_grid(points(N_PTS), targets))
    run("kde", lambda: kde_grid(points(N_PTS_AGG), targets, res=RES, bandwidth=0.02))
    run(
        "hotspot",
        lambda: local_stats(cell_counts(points(N_PTS_AGG), targets)),
    )
    n_tiles = run("glcm", lambda: texture_tiles(tiles()))
    run("shadow", lambda: shadow_tiles(tiles()))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "cores": cores,
                "round": round_tag,
                "n_pts": N_PTS,
                "n_scenes": N_SCENES,
                "n_cells": n_cells,
                "n_tiles": n_tiles,
                "timings": timings,
                "total_s": total,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
