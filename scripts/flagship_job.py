"""spark-submit entrypoint for the flagship pipeline.

Runs generate -> validate -> tile -> merge -> checkpointed partitioned write
through the resumable sink, printing per-stage metrics. Engine code arrives
via ``--py-files`` (see scripts/submit_job.sh); the SparkSession comes from
the cluster manager, not the local factory.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    spark = SparkSession.builder.appName("geozarr-spark-flagship").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from data_model_spark.operators import tiling
    from data_model_spark.operators.resume import (
        CheckpointLog,
        ResumableTileWrite,
        checkpoint_validation,
    )
    from data_model_spark.sources import images as img_src

    base = tempfile.mkdtemp(prefix="flagship_")
    t0 = time.perf_counter()
    images = img_src.generate_images_df(spark, n_images).cache()
    n = images.count()
    # validate stage writes per-bucket (n_pass, PSNR-sum) lineage to the
    # checkpoint table and is itself resumable (north-rule metrics clause)
    vrows, v_resumed = checkpoint_validation(
        spark, CheckpointLog(f"{base}/ckpt"), tiling.validate_images(images)
    )
    n_valid = sum(r.n_rows for r in vrows.collect())
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, min_dimension=64, repartition=False)
    ).persist()
    levels = sorted(r.level for r in merged.select("level").distinct().collect())
    sink = ResumableTileWrite(f"{base}/tiles", f"{base}/ckpt")
    results = sink.run(spark, merged, levels)
    n_tiles = merged.count()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "n_images": n,
                "n_valid": n_valid,
                "validate_resumed": v_resumed,
                "n_merged_tiles": n_tiles,
                "levels_written": results["written"],
                "levels_skipped": results["skipped"],
                "wall_s": round(wall, 2),
                "tiles_per_sec": round(n_tiles / wall, 2),
                "output": base,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
