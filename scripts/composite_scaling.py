"""Two-parallelism scaling probe for the temporal-compositing family
(median composite / feather blend / temporal trend) — the north-rule
N vs 4N protocol applied to the round-5 fourth wave.

These three operators share one shuffle shape (hash-repartition raw
scene->tile fragments on the tile key + streamed mapInPandas kernels),
the same shape the flagship's merge phase already evidences at 0.85+
efficiency in BENCH/BASELINE.md; this probe measures the family
directly at a 16x fixture (1536 scenes, real same-band overlap by
construction) so the claim is a number, not an analogy.

Usage: python scripts/composite_scaling.py CORES [ROUND_TAG]
Prints one JSON line: per-op seconds + scenes/sec at this core count.
Orchestrated by composite_scaling.sh (interleaved 2/8 pairs, medians).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SCENES = int(os.environ.get("SPARK_GRAFT_COMPOSITE_SCENES", "1536"))


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    round_tag = sys.argv[2] if len(sys.argv) > 2 else "0"

    from pyspark.sql import functions as F

    from data_model_spark.operators import composite, tiling
    from data_model_spark.session import get_spark
    from data_model_spark.sources.images import generate_images_df

    spark = get_spark(
        cores=cores,
        app_name=f"composite-scaling-{cores}",
        shuffle_partitions=max(2 * cores, 8),
        extra_conf={"spark.local.dir": f"/dev/shm/spark-local-comp-{cores}"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def frags():
        images = generate_images_df(spark, N_SCENES)
        return tiling.build_tiles(images, repartition=False).filter(
            F.col("level") == 0
        )

    timings: dict[str, float] = {}
    for name, fn in (
        ("median_composite", composite.median_composite),
        ("feather_blend", composite.feather_blend),
        ("temporal_trend", composite.temporal_trend),
    ):
        t0 = time.perf_counter()
        n = fn(frags()).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        timings[f"{name}_rows"] = n

    total = round(
        sum(v for k, v in timings.items() if not k.endswith("_rows")), 3
    )
    print(
        json.dumps(
            {
                "round": round_tag,
                "cores": cores,
                "scenes": N_SCENES,
                "total_s": total,
                "scenes_per_sec": round(3 * N_SCENES / total, 2),
                **timings,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
