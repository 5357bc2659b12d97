"""10x-scale flagship run with a merge-shuffle spill profile (VERDICT r3 #8).

Runs the full flagship pipeline (synthesize -> validate -> tile cut ->
merge shuffle -> spatially-blocked partitioned write) at 10x the per-round
bench's image count, on the bench session shape, and records per-stage
shuffle read/write and memory/disk spill from the Spark status API — the
inflection probe the sf0.1 bench can't see (a plan that silently starts
spilling at 10x would be a 100 TB red flag).

Usage: python scripts/sf10_flagship.py [n_images] (default 5120 = 10 x the
bench's 512).  Prints one JSON line; also appends BENCH/SF10_FLAGSHIP.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rest_json(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}{path}", timeout=10) as r:
        return json.load(r)


def stage_profile(port: int) -> list[dict]:
    """Per-stage shuffle/spill metrics from the local status REST API."""
    apps = _rest_json(port, "/api/v1/applications")
    app_id = apps[0]["id"]
    stages = _rest_json(port, f"/api/v1/applications/{app_id}/stages?status=complete")
    out = []
    for s in stages:
        out.append(
            {
                "stage": s["stageId"],
                "name": s["name"].split("\n")[0][:60],
                "tasks": s["numCompleteTasks"],
                "input_mb": round(s.get("inputBytes", 0) / 2**20, 1),
                "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 2**20, 1),
                "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 2**20, 1),
                "mem_spill_mb": round(s.get("memoryBytesSpilled", 0) / 2**20, 1),
                "disk_spill_mb": round(s.get("diskBytesSpilled", 0) / 2**20, 1),
            }
        )
    return out


def main() -> None:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
    shuffle_parts = int(sys.argv[2]) if len(sys.argv) > 2 else None
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ui_port = 4047

    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.plans.partitioning import spatial_block_partition
    from data_model_spark.session import get_spark
    from data_model_spark.sources import images as img_src

    spark = get_spark(
        cores=cores,
        shuffle_partitions=shuffle_parts,
        app_name=f"sf10-flagship-{n_images}",
        extra_conf={
            "spark.ui.enabled": "true",  # status REST API for the profile
            "spark.ui.port": str(ui_port),
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "24g"),
            "spark.local.dir": "/dev/shm/spark-sf10",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup iteration at 1/5 scale: JIT-compiles the decode/merge/
    # write paths and pre-faults guest pages (same protocol as
    # scaling_bench.py — a long-lived cluster executor is always warm)
    warm_dir = tempfile.mkdtemp(prefix="sf10_warm_", dir="/dev/shm")
    try:
        w_img = img_src.generate_images_df(spark, n_images // 5, num_partitions=64).cache()
        w_img.count()
        tiling.validate_images(w_img).filter("psnr_db >= 40").count()
        w_merged = tiling.merge_tiles(
            tiling.build_tiles(w_img, min_dimension=64, repartition=False)
        )
        (
            spatial_block_partition(w_merged, 2 * cores)
            .write.mode("overwrite")
            .partitionBy("var", "level")
            .parquet(warm_dir)
        )
        w_img.unpersist()
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    out_dir = tempfile.mkdtemp(prefix="sf10_tiles_", dir="/dev/shm")
    try:
        t0 = time.perf_counter()
        images = img_src.generate_images_df(spark, n_images, num_partitions=256).cache()
        n_img = images.count()
        t_gen = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_valid = tiling.validate_images(images).filter("psnr_db >= 40").count()
        t_val = time.perf_counter() - t0

        t0 = time.perf_counter()
        merged = tiling.merge_tiles(
            tiling.build_tiles(images, min_dimension=64, repartition=False)
        ).persist()
        n_merged = merged.count()
        n_frag = int(merged.agg(F.sum("n_sources")).collect()[0][0])
        t_merge = time.perf_counter() - t0

        t0 = time.perf_counter()
        (
            spatial_block_partition(merged, 2 * cores)
            .write.mode("overwrite")
            .partitionBy("var", "level")
            .parquet(out_dir)
        )
        t_write = time.perf_counter() - t0

        profile = stage_profile(ui_port)
        total = t_gen + t_val + t_merge + t_write
        spill_mem = sum(s["mem_spill_mb"] for s in profile)
        spill_disk = sum(s["disk_spill_mb"] for s in profile)
        result = {
            "n_images": n_img,
            "cores": cores,
            "shuffle_partitions": int(
                spark.conf.get("spark.sql.shuffle.partitions")
            ),
            "n_valid": n_valid,
            "n_tile_fragments": n_frag,
            "n_merged_tiles": n_merged,
            "t_generate_s": round(t_gen, 2),
            "t_validate_s": round(t_val, 2),
            "t_merge_s": round(t_merge, 2),
            "t_write_s": round(t_write, 2),
            "total_s": round(total, 2),
            "tiles_per_sec": round(n_merged / total, 2),
            "images_per_sec": round(n_img / total, 2),
            "mem_spill_mb_total": round(spill_mem, 1),
            "disk_spill_mb_total": round(spill_disk, 1),
            "stages_with_spill": [s for s in profile if s["disk_spill_mb"] > 0],
            "top_shuffle_stages": sorted(
                profile, key=lambda s: -s["shuffle_write_mb"]
            )[:5],
        }
        print(json.dumps(result))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
