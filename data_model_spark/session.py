"""SparkSession factory tuned for the engine.

Local mode stands in for a multi-executor cluster (see BASELINE.md scaling
protocol): partitioning/shuffle settings are chosen as they would be on a
1000-executor deployment — AQE on (runtime coalescing + skew-join splitting),
Arrow enabled with bounded batch sizes so per-image decode memory stays
capped (SURVEY.md §7 risk v), and explicit shuffle-partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "geozarr-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches bounded by BYTES, not rows (Spark 4's maxBytesPerBatch
        # is the direct knob — guide §4.2): image/tile rows (~100-300 KB) cap
        # at ~32 MB/batch, the same memory envelope the old 256-row cap gave
        # (SURVEY.md §7 risk v), while narrow rows batch 10k at a time instead
        # of paying Python/Arrow framing every 256 rows (measured r6:
        # pack_sequences 0.61 -> 0.26 s, lm_perplexity 1.13 -> 0.83 s,
        # str_pack_pages 0.56 -> 0.45 s; image paths unchanged-to-better)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", "32m")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # allow shuffled-hash join where its size conditions hold (guide §9):
        # the engine's candidate pair joins key on few high-duplicate cell
        # keys, where sort-merge pays a per-key buffering pass that a hash
        # probe avoids (measured r6: box_suppress_keep 7.2 -> 5.9 s,
        # ripley_k 5.4 -> 4.6 s).  Planner still falls back to sort-merge
        # when a build side cannot fit per-partition memory.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # HotSpot refuses to JIT methods over ~8000 bytecodes
        # (-XX:-DontCompileHugeMethods default), so a whole-stage-codegen
        # method between 8000 and Spark's 65535 default limit runs as
        # INTERPRETED bytecode — measured 15x slower than the volcano
        # fallback on a broadcast join whose probe key is a wide
        # arithmetic expression (hexgrid cube rounding).  Lowering the
        # limit to the JIT threshold makes Spark fall back for exactly
        # the stages HotSpot would refuse anyway — strictly better.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        # Bound GENERATOR task size the way files.maxPartitionBytes bounds
        # scan tasks.  PySpark's spark.range() hard-codes numPartitions =
        # sc.defaultParallelism (sql/session.py), so a billion-row synthetic
        # source becomes ONE giant loop invocation per core.  HotSpot can
        # then strand the whole job in C1 tier-3 OSR code: the tier-4 OSR
        # of the codegen'd agg loop hits an uncommon-trap deopt shortly
        # after install, the replacement tier-3 OSR never re-promotes
        # (single-invocation methods never retrigger the invocation
        # counter), and every thread that enters after the deopt runs
        # profiling code for the rest of the stage — measured 13-24x
        # slower at local[32] (196 s vs 14.5 s for a 1.6B-row hex-encode
        # groupBy; PrintCompilation shows the tier-4 OSR made not entrant
        # at +0.5 s with no re-promotion).  >=4 tasks per thread restores
        # method re-entry and full-speed code (1.6B rows: 32 slices 196 s,
        # 64 -> 55 s, 128 -> 6.1 s, 256 -> 6.0 s); 8x is used for margin.
        # On a real cluster the same rule holds per executor slot.
        .config("spark.default.parallelism", str(8 * cores))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.extraJavaOptions", "-Dio.netty.tryReflectionSetAccessible=true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
