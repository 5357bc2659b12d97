"""Extra benchmarks for optimization work (guide §1.4: noop-sink isolation).

NOT part of the driver contract — ``bench.py`` stays frozen.  This harness
times individual pipeline stages and selected registry queries in one
session so per-stage costs can be attributed (fixture generation vs shuffle
vs operator kernel).

Usage:
    python bench_extra.py fixtures           # fixture-stage breakdown
    python bench_extra.py query NAME [NAME…] # selected registry queries
    python bench_extra.py plans NAME [NAME…] # dump .explain("formatted")
"""

from __future__ import annotations

import json
import os
import sys
import time


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))
    mode = sys.argv[1] if len(sys.argv) > 1 else "fixtures"
    names = sys.argv[2:]

    from data_model_spark.session import get_spark

    spark = get_spark(cores=cores, app_name="geozarr-spark-bench-extra")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda s: s, T.LongType())
    spark.range(0, cores * 4, numPartitions=cores * 4).select(_warm("id")).count()
    from data_model_spark.sources.tables import load_table as _lt

    _lt(spark, sf_dir, "customer").count()

    out: dict[str, float] = {}

    def timed(name: str, fn, cleanup=None):
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
            if cleanup is not None:
                cleanup()
        times.sort()
        out[name] = round(times[len(times) // 2], 3)

    if mode == "fixtures":
        from data_model_spark.operators import tiling
        from data_model_spark.sources import images as img_src

        for n in (24, 48):
            spark.sparkContext.setJobDescription(f"fixture: generate {n}")
            timed(f"generate_{n}", lambda n=n: _noop(img_src.generate_images_df(spark, n)))
            spark.sparkContext.setJobDescription(f"fixture: tiles {n}")
            timed(
                f"tiles_{n}",
                lambda n=n: _noop(
                    tiling.build_tiles(
                        img_src.generate_images_df(spark, n), repartition=False
                    )
                ),
            )
            spark.sparkContext.setJobDescription(f"fixture: merged {n}")
            timed(
                f"merged_{n}",
                lambda n=n: _noop(
                    tiling.merge_tiles(
                        tiling.build_tiles(
                            img_src.generate_images_df(spark, n), repartition=False
                        )
                    )
                ),
            )
        spark.sparkContext.setJobDescription(None)
    elif mode in ("query", "plans"):
        from data_model_spark.cache import unpersist_tracked
        from data_model_spark.operators.registry import all_queries

        registry = all_queries()
        for name in names:
            spec = registry[name]
            if mode == "plans":
                df = spec.spark_fn(spark, sf_dir)
                print(f"===== {name} =====")
                df.explain("formatted")
                unpersist_tracked()
            else:
                spark.sparkContext.setJobDescription(f"query: {name}")
                timed(
                    name,
                    lambda s=spec: s.spark_fn(spark, sf_dir).count(),
                    cleanup=unpersist_tracked,
                )
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({"mode": mode, "reps": reps, "cores": cores, "timings": out}))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
