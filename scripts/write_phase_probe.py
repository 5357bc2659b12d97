"""Diagnose the non-scaling write phase (VERDICT round 1, item 2).

Runs ONE pipeline up to the persisted merged tiles, then times write
variants on the same data, several repetitions each, at a given core
count.  Variants:

* range32  — current: repartitionByRange(32, level, tile_y, tile_x)
* direct   — write merged as-is (already hash-partitioned by tile key)
* hash2c   — repartition(2*cores) on (level, tile_y, tile_x) hash
* sortwp   — sortWithinPartitions(level, tile_y, tile_x), no shuffle

Usage: python scripts/write_phase_probe.py CORES [N_IMAGES] [REPS]
Prints one JSON line: per-variant median seconds + stage detail.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_images = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.session import get_spark
    from data_model_spark.sources import images as img_src

    spark = get_spark(
        cores=cores,
        app_name=f"write-probe-{cores}",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g"),
            "spark.local.dir": f"/dev/shm/spark-probe-{cores}",
            "spark.driver.extraJavaOptions": "-XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    images = img_src.generate_images_df(spark, n_images, num_partitions=128).cache()
    images.count()
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, min_dimension=64, repartition=False)
    ).persist()
    n_merged = merged.count()

    def variant_df(name):
        if name == "range32":
            return merged.repartitionByRange(32, "level", "tile_y", "tile_x")
        if name == "direct":
            return merged
        if name == "hash2c":
            return merged.repartition(2 * cores, "level", "tile_y", "tile_x")
        if name == "sortwp":
            return merged.sortWithinPartitions("level", "tile_y", "tile_x")
        if name == "block2c":
            # the SHIPPED default write layout — call the helper so the
            # probe always measures exactly what the pipeline writes
            from data_model_spark.plans.partitioning import spatial_block_partition

            return spatial_block_partition(merged, 2 * cores)
        if name == "zorder2c":
            # the opt-in Morton layout (ResumableTileWrite layout="zorder")
            from data_model_spark.plans.partitioning import zorder_partition_auto

            return zorder_partition_auto(merged, 2 * cores)
        raise ValueError(name)

    results = {}
    for name in ("range32", "direct", "hash2c", "sortwp", "block2c", "zorder2c"):
        times = []
        for _ in range(reps):
            out = tempfile.mkdtemp(prefix=f"probe_{name}_", dir="/dev/shm")
            t0 = time.perf_counter()
            (
                variant_df(name)
                .write.mode("overwrite")
                .partitionBy("level")
                .parquet(out)
            )
            times.append(round(time.perf_counter() - t0, 3))
            nfiles = sum(
                len([f for f in files if f.endswith(".parquet")])
                for _, _, files in os.walk(out)
            )
            shutil.rmtree(out, ignore_errors=True)
        results[name] = {
            "median_s": statistics.median(times),
            "all_s": times,
            "n_files": nfiles,
        }

    print(
        json.dumps(
            {"cores": cores, "n_images": n_images, "n_merged": n_merged, **results}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
