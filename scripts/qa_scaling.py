"""Two-parallelism scaling probe for the round-5 QA/resample closing
family (waves 31-33): Harris corner screen, mosaic seam QA, bicubic
overzoom, cross-level pyramid audit, focal majority filter.

The north-rule N vs 4N protocol (same input, local[2] vs local[8]
physical-core regime, interleaved rounds, warm-run headline —
``newwave_scaling.py`` conventions).  Fixture: the 768-scene merged
mosaic (levels 0+1 — the pyramid audit needs both; the per-tile ops
run on level 0), ~2k level-0 tiles.

Usage: python scripts/qa_scaling.py CORES [ROUND_TAG]
Prints one JSON line; orchestrated by qa_scaling.sh.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SCENES = int(os.environ.get("SPARK_GRAFT_QA_SCENES", "768"))


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    round_tag = sys.argv[2] if len(sys.argv) > 2 else "0"

    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.operators.harris import harris_tiles
    from data_model_spark.operators.majority import majority_tiles
    from data_model_spark.operators.pyramid_audit import pyramid_audit
    from data_model_spark.operators.seams import seam_qa
    from data_model_spark.operators.upsample import bicubic_overzoom_tiles
    from data_model_spark.session import get_spark
    from data_model_spark.sources.images import generate_images_df

    spark = get_spark(
        cores=cores,
        app_name=f"qa-scaling-{cores}",
        shuffle_partitions=max(2 * cores, 8),
        extra_conf={"spark.local.dir": f"/dev/shm/spark-local-qa-{cores}"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    both = tiling.merge_tiles(
        tiling.build_tiles(generate_images_df(spark, N_SCENES), repartition=False)
    ).filter(F.col("level") <= 1)
    both = both.persist()
    n_tiles = both.count()  # materialize once; input identical at both cores
    l0 = both.filter(F.col("level") == 0)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}

    def run(name, fn):
        t0 = time.perf_counter()
        fn().count()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n = fn().count()
        timings[name] = round(time.perf_counter() - t0, 3)
        return n

    run("harris", lambda: harris_tiles(l0))
    run("seams", lambda: seam_qa(l0))
    run("bicubic", lambda: bicubic_overzoom_tiles(l0))
    run("majority", lambda: majority_tiles(l0))
    run("pyr_audit", lambda: pyramid_audit(both))

    out = {
        "cores": cores,
        "round": round_tag,
        "n_tiles": n_tiles,
        "timings": timings,
        "cold": cold,
        "total_s": round(sum(timings.values()), 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
