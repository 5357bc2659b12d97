"""10x scaling probe for the iterative-graph heavy hitters (VERDICT r4 #7).

Runs dbscan_clusters, dedup_components, semdedup_keep and pagerank_trade
at sf0.01 and sf0.1 (10x the input) on the same core count, recording
TOTAL time and PER-ROUND times for the star-contraction / power-iteration
loops (via operators.components.ROUND_HOOK).  The claim under test: the
round floor amortizes — round count stays O(log n) (flat-ish at 10x) and
per-round cost is bounded-shuffle (grows ~linearly with the data, not
super-linearly), so the iterative operators keep scaling where a
round-count blow-up or per-round quadratic join would not.

Usage: python scripts/graph_scaling_bench.py [CORES]
Writes one JSON line per (query, sf) to stdout; BENCH/GRAPH_SCALING.md
holds the analyzed table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["dedup_components", "semdedup_keep", "dbscan_clusters", "pagerank_trade"]
SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from data_model_spark.cache import unpersist_tracked
    from data_model_spark.operators import components as cmp
    from data_model_spark.operators.registry import all_queries
    from data_model_spark.session import get_spark

    spark = get_spark(cores=cores, app_name="graph-scaling-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm the Python worker pool once
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda s: s, T.LongType())
    spark.range(0, cores * 4, numPartitions=cores * 4).select(_warm("id")).count()

    for name in QUERIES:
        for sf_dir in SFS:
            rounds: list[dict] = []
            cmp.ROUND_HOOK = lambda tag, r, s, n: rounds.append(
                {"tag": tag, "round": r, "sec": round(s, 3), "size": n}
            )
            try:
                t0 = time.perf_counter()
                n_rows = registry[name].spark_fn(spark, sf_dir).count()
                total = round(time.perf_counter() - t0, 3)
            finally:
                cmp.ROUND_HOOK = None
                unpersist_tracked()
            print(
                json.dumps(
                    {
                        "query": name,
                        "sf_dir": sf_dir,
                        "cores": cores,
                        "rows": n_rows,
                        "total_sec": total,
                        "n_rounds": len(rounds),
                        "rounds": rounds,
                    }
                ),
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
