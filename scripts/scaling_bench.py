"""Scaling-evidence job (BASELINE.json north rule, sandbox protocol).

Runs the flagship pipeline — synthesize image+caption rows (encode), decode +
PSNR-validate, cut multiscale tiles, merge fragments into global tiles
(hash shuffle keyed by tile), range-partition the merged tiles and write the
partitioned tile table — at a fixed input size and a caller-chosen core
count, then prints one JSON line with throughput. ``scaling_bench.sh`` runs
it at local[8] and local[32] (N and 4N cores standing in for N and 4N
executors) and computes

    efficiency = throughput(4N) / (4 * throughput(N)) = T_N / (4 * T_4N)

Work decomposition is held identical across runs: the image scan is planned
at a fixed partition count (128) and shuffles at a fixed partition count
(64), so only the executor-slot count varies — the same control a
spark-submit deployment varies between cluster sizes.

Plan-shape notes (the 100 TB rationale):
* raw tile fragments are NEVER cached or range-sampled — merge consumes
  them in the applyInPandas hash shuffle directly; at 10^12 images the
  fragment stream is the biggest intermediate and must stay single-pass.
* the write layout uses ``spatial_block_partition`` on the *merged* tiles
  (4-5x smaller): a deterministic hash of (level, tile_y-band) with an
  in-partition sort — spatially clustered files (bbox/point queries prune
  on file-level stats) WITHOUT repartitionByRange's sampling job, which
  measured as the write phase's non-scaler (scripts/write_phase_probe.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    round_tag = sys.argv[2] if len(sys.argv) > 2 else "0"
    n_images = int(os.environ.get("SPARK_GRAFT_SCALE_IMAGES", "4096"))
    input_partitions = int(os.environ.get("SPARK_GRAFT_SCALE_PARTS", "128"))

    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.session import get_spark
    from data_model_spark.sources import images as img_src

    spark = get_spark(
        cores=cores,
        app_name=f"scaling-bench-{cores}",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "16g"),
            # tmpfs shuffle dir: the sandbox's virtio disk has high variance
            # (measured 20-600 MB/s); the protocol measures CPU scaling, so
            # shuffle+output go to RAM the way a cluster uses local NVMe
            "spark.local.dir": f"/dev/shm/spark-local-{cores}",
            # this VM's memory is lazily paged by the hypervisor: first touch
            # of a new page runs at ~35 MB/s/thread while warm pages copy at
            # ~20 GB/s/thread (scripts/machine_ceiling.py). Pre-fault the heap
            # so the timed phases never pay the hypervisor fault path.
            "spark.driver.extraJavaOptions": "-XX:+AlwaysPreTouch"
            " -Dio.netty.tryReflectionSetAccessible=true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm executors once (python worker spawn, Arrow init) — untimed
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda s: s, T.LongType())
    spark.range(0, cores * 4, numPartitions=cores * 4).select(_warm("id")).count()
    # JIT-warm the shuffle + parquet-write machinery (first write job in a
    # JVM pays ~30-50s of C2 compilation otherwise — a fixed cost a
    # long-lived cluster never re-pays, not part of the throughput metric)
    warm_dir = tempfile.mkdtemp(prefix="warm_", dir="/dev/shm")
    (
        spark.range(0, 10000)
        .withColumn("k", F.pmod("id", F.lit(7)))
        .repartitionByRange(4, "k", "id")
        .write.mode("overwrite")
        .partitionBy("k")
        .parquet(warm_dir)
    )
    shutil.rmtree(warm_dir, ignore_errors=True)

    def run_pipeline(out_dir: str) -> dict:
        t0 = time.perf_counter()
        images = img_src.generate_images_df(
            spark, n_images, num_partitions=input_partitions
        ).cache()
        n_img = images.count()
        t_generate = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_valid = tiling.validate_images(images).filter("psnr_db >= 40").count()
        t_validate = time.perf_counter() - t0

        t0 = time.perf_counter()
        tiles = tiling.build_tiles(images, min_dimension=64, repartition=False)
        merged = tiling.merge_tiles(tiles).persist()
        n_merged = merged.count()
        n_fragments = merged.agg(F.sum("n_sources")).collect()[0][0]
        t_merge = time.perf_counter() - t0

        t0 = time.perf_counter()
        from data_model_spark.plans.partitioning import spatial_block_partition

        (
            # deterministic spatial blocks: repartitionByRange's sampling
            # job was the write phase's non-scaler (see write_phase_probe)
            spatial_block_partition(merged, 2 * cores)
            .write.mode("overwrite")
            .partitionBy("var", "level")  # band-by-band layout (multi-band)
            .parquet(out_dir)
        )
        t_write = time.perf_counter() - t0

        images.unpersist()
        merged.unpersist()
        total = t_generate + t_validate + t_merge + t_write
        return {
            "cores": cores,
            "round": round_tag,
            "n_images": n_img,
            "n_valid": n_valid,
            "n_tile_fragments": int(n_fragments),
            "n_merged_tiles": n_merged,
            "t_generate_s": round(t_generate, 3),
            "t_validate_s": round(t_validate, 3),
            "t_merge_s": round(t_merge, 3),
            "t_write_s": round(t_write, 3),
            "total_s": round(total, 3),
            "tiles_per_sec": round(n_merged / total, 2),
            "rows_per_sec": round((n_merged + int(n_fragments)) / total, 2),
            "images_per_sec": round(n_img / total, 2),
        }

    # warmup iteration: the full pipeline once, untimed — faults in guest
    # pages (heap growth, Arrow pools, tmpfs), JIT-compiles the write path.
    # A long-lived cluster executor runs in this warmed state permanently;
    # the hypervisor's lazy-page cost is a boot cost, not throughput.
    dirs = [
        tempfile.mkdtemp(prefix=f"tiles_{cores}_{tag}_", dir="/dev/shm")
        for tag in ("warm", "timed")
    ]
    try:
        run_pipeline(dirs[0])
        shutil.rmtree(dirs[0], ignore_errors=True)
        out = run_pipeline(dirs[1])
        print(json.dumps(out))
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
