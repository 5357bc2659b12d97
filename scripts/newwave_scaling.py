"""Two-parallelism scaling probe for the round-5 closing waves
(22-30): the lattice-index family (hex encode/buckets/k-ring, S2
cells), the series family (Theil-Sen, seasonal, Kleinberg bursts), the
sketch-iteration family (HyperANF), and the pixel-kernel family (EDT,
Hough, Brovey).

The north-rule N vs 4N protocol (same input, local[2] vs local[8]
physical-core regime, interleaved rounds, medians).  Fixture sizes are
scaled so each family runs seconds, not milliseconds, at local[2]:

* lattice: 1.6B-point congruential scatter (hex buckets), 256M-point
  k-ring probe set vs 200-query ring join, 16M-point S2 encode;
* series: 240,000 users x 120 events for Theil-Sen (~1.7B pairwise
  slopes inside the per-group kernel) and seasonal windows, 32,000
  term streams;
* graph: 1.6M-node ring + chords (degree 4), 2 HyperANF rounds;
* kernels: 768-scene tile table (EDT + Hough), 4,096-scene Brovey.

Usage: python scripts/newwave_scaling.py CORES [ROUND_TAG]
Prints one JSON line; orchestrated by newwave_scaling.sh.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HEX = int(os.environ.get("SPARK_GRAFT_NW_HEX", "1600000000"))
N_KRING = int(os.environ.get("SPARK_GRAFT_NW_KRING", "256000000"))
N_S2 = int(os.environ.get("SPARK_GRAFT_NW_S2", "16000000"))
N_USERS = int(os.environ.get("SPARK_GRAFT_NW_USERS", "24000"))
N_PER_USER = int(os.environ.get("SPARK_GRAFT_NW_PER_USER", "120"))
N_TERMS = int(os.environ.get("SPARK_GRAFT_NW_TERMS", "32000"))
N_NODES = int(os.environ.get("SPARK_GRAFT_NW_NODES", "1600000"))
N_SCENES_K = int(os.environ.get("SPARK_GRAFT_NW_SCENES", "768"))
N_SCENES_B = int(os.environ.get("SPARK_GRAFT_NW_BROVEY", "4096"))


def main() -> int:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    round_tag = sys.argv[2] if len(sys.argv) > 2 else "0"

    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.operators.bursts import burst_terms
    from data_model_spark.operators.edt import edt_tiles
    from data_model_spark.operators.hexgrid import KRING, PACK, hex_cols, kring_offsets
    from data_model_spark.operators.hough import hough_tiles
    from data_model_spark.operators.hyperanf import hyperanf_states
    from data_model_spark.operators.pansharpen import sharpen_scenes
    from data_model_spark.operators.s2grid import s2_point_cells
    from data_model_spark.operators.seasonal import seasonal_profile
    from data_model_spark.operators.theilsen import theil_sen
    from data_model_spark.session import get_spark
    from data_model_spark.sources.images import generate_images_df

    spark = get_spark(
        cores=cores,
        app_name=f"newwave-scaling-{cores}",
        shuffle_partitions=max(2 * cores, 8),
        extra_conf={"spark.local.dir": f"/dev/shm/spark-local-nw-{cores}"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def points(n):
        return (
            spark.range(1, n + 1)
            .select(F.col("id").alias("point_id"))
            .withColumn(
                "lon", 10.0 + F.pmod(F.col("point_id") * 37, F.lit(n)) * (2.0 / n)
            )
            .withColumn(
                "lat", 46.0 + F.pmod(F.col("point_id") * 91, F.lit(n)) * (2.0 / n)
            )
        )

    def events(n_users, per_user):
        # synthetic per-user series: ts strictly increasing per user
        return (
            spark.range(n_users * per_user)
            .selectExpr(
                f"id % {n_users} AS user_id",
                f"CAST(id / {n_users} AS BIGINT) AS seq",
            )
            .selectExpr(
                "user_id",
                "CAST(timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,seq*60) AS timestamp) AS ts",
                "seq AS event_id",
                "CAST(pmod(user_id * 7 + seq * 13, 1000) AS DOUBLE) / 10.0 AS value",
            )
        )

    def ring_edges(n):
        # ring + long chords: diameter-ish graph with degree 4
        e = spark.range(n).selectExpr(
            "id AS src", f"pmod(id + 1, {n}) AS dst"
        ).union(
            spark.range(n).selectExpr(
                "id AS src", f"pmod(id + {n // 3}, {n}) AS dst"
            )
        )
        return e.union(e.selectExpr("dst AS src", "src AS dst"))

    def tiles(n_scenes):
        images = generate_images_df(spark, n_scenes)
        return tiling.merge_tiles(
            tiling.build_tiles(images, repartition=False)
        ).filter(F.col("level") == 0)

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}

    def run(name, fn):
        # Two timed executions per op; the WARM one is the headline.
        # One-shot timing charges the whole JIT/codegen warmup of each
        # op's generated stages to whichever core count runs it — a
        # near-constant absolute cost (measured ~7-8 s for theil_sen at
        # BOTH local[2] and local[8]) that is amortized over a 4x
        # longer run at 2 cores, systematically depressing the 2->8
        # ratio.  The north rule's metric is sustained throughput at
        # 10^12 rows, where warmup is noise — same reasoning as
        # bench.py's median-of-3.  Cold runs are kept alongside.
        t0 = time.perf_counter()
        n = fn().count()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n = fn().count()
        timings[name] = round(time.perf_counter() - t0, 3)
        return n

    # lattice family
    def hex_buckets_big():
        pts = points(N_HEX)
        q, r = hex_cols(F.col("lon"), F.col("lat"))
        return (
            pts.select(q.alias("hq"), r.alias("hr"))
            .groupBy("hq", "hr")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def hex_kring_big():
        # pitch sized to the fixture density (64M points in the 2x2-deg
        # box): size=0.0005 gives ~0.4 points per cell, the production
        # shape where ring output stays O(k) per query
        ksize = 0.0005
        pts = points(N_KRING)
        q, r = hex_cols(F.col("lon"), F.col("lat"), ksize)
        pts = pts.select("point_id", q.alias("hq"), r.alias("hr"))
        # query scatter on DIFFERENT multipliers (the registered-query
        # fixture): queries must not ride the dense point diagonal, else
        # the matched output explodes and the probe measures row
        # materialization instead of the candidate join
        qrs = (
            spark.range(1, 201)
            .select(F.col("id").alias("query_id"))
            .withColumn("lon", 10.0 + F.pmod(F.col("query_id") * 53, F.lit(2000)) / 1000.0)
            .withColumn("lat", 46.0 + F.pmod(F.col("query_id") * 29, F.lit(2000)) / 1000.0)
        )
        qq, qr2 = hex_cols(F.col("lon"), F.col("lat"), ksize)
        qrs = qrs.select("query_id", qq.alias("qhq"), qr2.alias("qhr"))
        offs = F.array(
            *[
                F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
                for dq, dr in kring_offsets(KRING)
            ]
        )
        cand = qrs.select("query_id", F.explode(offs).alias("o"), "qhq", "qhr").select(
            "query_id",
            (
                (F.col("qhq") + F.col("o.dq")) * F.lit(PACK)
                + (F.col("qhr") + F.col("o.dr"))
            ).alias("cell"),
        )
        pts_cell = pts.select(
            "point_id", (F.col("hq") * F.lit(PACK) + F.col("hr")).alias("cell")
        )
        return pts_cell.join(F.broadcast(cand), ["cell"]).select("query_id", "point_id")

    run("hex_buckets", hex_buckets_big)
    run("hex_kring", hex_kring_big)
    run("s2_cells", lambda: s2_point_cells(spark, n=N_S2))

    # series family
    ev_big = events(N_USERS * 10, N_PER_USER)
    # theil_sen moved to the 10x fixture after the per-group-kernel
    # rewrite (collect_list + pandas_udf): the 24k-user fixture now
    # finishes in ~1.6 s warm at local[8] — below the probe's noise
    # floor; 240k users keeps it in the measurable band
    run("theil_sen", lambda: theil_sen(ev_big))
    run("seasonal", lambda: seasonal_profile(ev_big))
    run("bursts", lambda: burst_terms(spark, n_terms=N_TERMS))

    # sketch-iteration family
    run("hyperanf", lambda: hyperanf_states(ring_edges(N_NODES), rounds=2))

    # pixel-kernel family
    t = tiles(N_SCENES_K)
    n_tiles = run("edt", lambda: edt_tiles(t))
    run("hough", lambda: hough_tiles(t))
    run("brovey", lambda: sharpen_scenes(spark, n=N_SCENES_B))

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "cores": cores,
                "round": round_tag,
                "n_tiles": n_tiles,
                "timings": timings,
                "cold": cold,
                "total_s": total,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
