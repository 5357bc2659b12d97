"""Skew evidence: salted vs unsalted hot-key self-join, measured.

Fixture: one boilerplate 3-gram planted in half the corpus — the
mega-reducer shape (f rows on one key -> f(f-1)/2 pair work in ONE task).

Two readings, both printed:

* ``max_reducer_pairs`` — the pair-enumeration bound of the single busiest
  reducer, computed from the MEASURED per-(key[,salt]) bucket occupancies.
  This is the straggler bound that matters at scale: wall-clock of the
  stage ~= max_reducer_pairs / per-core rate once f is large enough that
  one reducer's quadratic exceeds everything else (f >= ~10^6).  Salting
  divides it by ``salt``.
* wall seconds at THIS toy scale — reported honestly: here the single hot
  task still fits one core while the other cores chew cold keys, so the
  salted path's overhead (build-side replication, hot/cold split joins)
  makes it SLOWER locally.  ``self_pairs``'s ``hot_min`` threshold exists
  precisely so small keys never pay that overhead; the salted path is the
  insurance policy for the f where the unsalted stage stops finishing.

Output equality of the two paths is asserted (``pairs_equal``).

Usage: python scripts/skew_probe.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    salt = 8

    import numpy as np
    from pyspark.sql import functions as F

    from data_model_spark.operators import dedup
    from data_model_spark.session import get_spark

    spark = get_spark(cores=cores, app_name=f"skew-probe-{cores}",
                      shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(11)
    rows = []
    for i in range(n_docs):
        words = [f"w{rng.integers(0, 5000)}" for _ in range(16)]
        if i % 2 == 0:  # hot boilerplate 3-gram in 50% of docs
            words[4:4] = ["terms", "of", "service"]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = dedup.shingles_df(docs, 3)
    sh.persist().count()  # isolate the join cost from shingle generation

    # --- straggler bound from measured bucket occupancies -----------------
    # unsalted: every row of a key lands on one reducer -> f(f-1)/2 pairs
    freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
    unsalted_max = freq.agg(
        F.max(F.col("f") * (F.col("f") - 1) / 2).alias("m")
    ).collect()[0][0]
    # salted: probe rows of a hot key split into `salt` buckets; the build
    # side is replicated, so bucket work = probe_bucket_rows * f
    hot = sh.join(
        F.broadcast(freq.filter(F.col("f") >= 512).select("shingle", "f")),
        "shingle",
    )
    salted_max = (
        hot.groupBy(
            "shingle", F.pmod(F.xxhash64("doc_id"), F.lit(salt)).alias("s")
        )
        .agg(F.count("*").alias("probe_rows"), F.first("f").alias("f"))
        .agg(F.max(F.col("probe_rows") * F.col("f")).alias("m"))
        .collect()[0][0]
    ) or 0

    # --- wall clock (toy scale, see module docstring) ---------------------
    def run(s):
        t0 = time.perf_counter()
        n = dedup.self_pairs(sh, ["shingle"], salt=s, hot_min=512).count()
        return n, round(time.perf_counter() - t0, 2)

    run(0), run(salt)  # warm both paths (JIT)
    n_unsalted, t_unsalted = run(0)
    n_salted, t_salted = run(salt)

    print(json.dumps({
        "n_docs": n_docs,
        "cores": cores,
        "salt": salt,
        "hot_key_rows": n_docs // 2,
        "pairs": n_salted,
        "pairs_equal": n_salted == n_unsalted,
        "max_reducer_pairs_unsalted": int(unsalted_max),
        "max_reducer_pairs_salted": int(salted_max),
        "straggler_reduction": round(unsalted_max / max(salted_max, 1), 2),
        "t_unsalted_s": t_unsalted,
        "t_salted_s": t_salted,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
