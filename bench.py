"""Benchmark harness (driver contract: one JSON line to stdout).

Runs the flagship image pipeline plus headline operator queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, ...extras}

Extras report tiles/sec + join-rows/sec (the BASELINE.json metric) so the
scaling run (scripts/scaling_bench.sh -> BENCH/BASELINE.md) can compute
efficiency between core counts.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_images = int(os.environ.get("SPARK_GRAFT_N_IMAGES", "512"))
    import re

    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from data_model_spark.operators import tiling
    from data_model_spark.operators.registry import all_queries
    from data_model_spark.session import get_spark
    from data_model_spark.sources import images as img_src

    spark = get_spark(cores=cores, app_name="geozarr-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the executor pool once before timing (Python worker spawn + Arrow
    # init + parquet footer reads) — the steady-state a long-lived cluster
    # runs at; cold-start is a fixed cost, not part of the throughput metric.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda s: s, T.LongType())
    spark.range(0, cores * 4, numPartitions=cores * 4).select(_warm("id")).count()
    from data_model_spark.sources.tables import load_table as _lt

    _lt(spark, sf_dir, "customer").count()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    # median-of-N for operator queries (VERDICT r4 #9): distinguishes plan
    # regressions from session-load noise without standalone re-measures.
    # Flagship pipeline stages stay single-shot — their first run IS the
    # metric (materialization of the persisted mosaic).
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "3"))

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    def timed_median(name: str, fn, cleanup=None):
        """Run ``fn`` ``reps`` times; record the median; return first result."""
        times, out = [], None
        for i in range(reps):
            t0 = time.perf_counter()
            res = fn()
            times.append(time.perf_counter() - t0)
            if i == 0:
                out = res
            if cleanup is not None:
                cleanup()
        times.sort()
        timings[name] = round(times[len(times) // 2], 3)
        return out

    # ---- flagship: decode -> pyramid tiles -> merge (the one shuffle) ----
    # raw fragments flow straight into merge's applyInPandas hash shuffle —
    # never cached or range-sampled (the biggest intermediate at scale);
    # see scripts/scaling_bench.py for the write-side range partitioning
    images = img_src.generate_images_df(spark, n_images)
    images.cache()
    timed("flagship_generate", lambda: images.count())

    tiles = tiling.build_tiles(images, min_dimension=64, repartition=False)
    merged = tiling.merge_tiles(tiles)
    merged.persist()
    n_merged = timed("flagship_merge", lambda: merged.count())
    n_tiles = timed(
        "flagship_metrics",
        lambda: int(merged.agg({"n_sources": "sum"}).collect()[0][0]),
    )
    n_valid = timed(
        "flagship_validate",
        lambda: tiling.validate_images(images).filter("psnr_db >= 40").count(),
    )
    pipeline_s = timings["flagship_merge"] + timings["flagship_metrics"]
    extras["tiles_per_sec"] = round(n_tiles / max(pipeline_s, 1e-9), 1)
    extras["n_tiles"] = n_tiles
    extras["n_merged_tiles"] = n_merged
    extras["n_images"] = n_images
    extras["n_valid_images"] = n_valid

    # ---- raster operators over the SHARED merged tile table ----
    # The registry twins of these queries build their own private 48-image
    # mosaic (self-contained for the driver's fresh-session gate); timing
    # those here would measure fixture generation under cache pressure, not
    # the operator (measured 3x inflation).  The bench instead drives each
    # operator against the n_images-scene merged table above — larger input
    # AND pure operator cost.
    import numpy as np

    from data_model_spark.functions import crs as C
    from data_model_spark.operators import focal, render, terrain, zonal

    m0 = merged.filter(F.col("level") == 0)

    def _render():
        ax, ay = img_src.scene_anchor(16)
        lon, lat = C.transform_points(
            np.array([ax + 1280.0]), np.array([ay + 2560.0]),
            img_src.SCENE_EPSG, 4326,
        )
        lon, lat = float(lon[0]), float(lat[0])
        frames = []
        for z in (13, 12):
            tx, ty = render.mercator_tile_for(lon, lat, z)
            xy = [(tx + dx, ty + dy) for dx in (0, 1) for dy in (0, 1)]
            frames.append(render.render_tiles(merged, z, xy, var="b01"))
        return frames[0].unionByName(frames[1]).count()

    def _zonal():
        # aligned block (interior path), sub-tile, wide unaligned span,
        # east strip — over the 64x8-scene extent
        zones = zonal.zones_df(
            spark,
            {
                "za": (236 * 2560, 1989 * 2560, 244 * 2560, 1993 * 2560),
                "zb": (610130, 5095070, 611000, 5095550),
                "zc": (612640, 5092320, 658960, 5104500),
                "zd": (700800, 5091000, 755600, 5101560),
            },
        )
        return zonal.zonal_stats(m0, zones, level=0).count()

    timed_median("tile_render", _render)
    timed_median("zonal_stats", _zonal)
    timed_median("focal_mean", lambda: focal.focal_stats(m0, radius=1).count())
    timed_median("hillshade", lambda: terrain.hillshade(m0).count())

    # ---- headline operator queries at the target SF ----
    headline = [
        "block_avg",
        "two_phase_avg",
        "topk_window",
        "broadcast_dim",
        "semi_anti",
        "inject_join",
        "ngram_jaccard_pairs",
        "minhash_lsh_pairs",
        "ann_bruteforce_topk",
        "pip_rect_join",
        "pip_cell_join",
        "knn_cells",
        "token_count",
        "quality_score",
        "gcp_warp",
        "phash_neardup_pairs",
        "grouping_rollup",
        "pyramid_cascade",
        "emb_neardup_lsh_pairs",
        "streaming_event_windows",
        "dedup_components",
        "ivf_kmeans_assign",
        "sessionize",
        "trajectory_cell_cover",
        "dbscan_clusters",
        "polygon_overlay",
        "lm_perplexity",
        # r5 additions: the other iterative-graph heavy hitters (VERDICT
        # r4 #7 visibility) and the new zarr / recall surfaces
        "semdedup_keep",
        "pagerank_trade",
        "zarr_store_meta",
        "geozarr_sharded_rt",
        "ann_recall_planted",
        "geozarr_store_rt",
        "quantized_recall",
        "hard_negatives",
        # r5 third wave: layout keys, pipeline QA, quality, Gramian
        "zorder_regions",
        "hilbert_regions",
        "pii_scrub_stats",
        "lsh_pr_stats",
        "ssim_tiles_fp",
        "emb_gramian",
        "segment_intersections",
        "curation_pipeline",
        "cusum_changepoints",
        "curriculum_buckets",
        "lpa_communities",
        "source_similarity",
        "dedup_delta_pairs",
        "cell_rollup_counts",
        "negative_edges",
        "dataset_card",
        # r5 fourth wave: EO compositing / morphology / splits / viewshed
        "median_composite_fp",
        "feather_blend_fp",
        "morph_gradient_fp",
        "morph_open_fp",
        "leakage_free_split",
        "viewshed_fp",
        "stac_items",
        "split_leakage_audit",
        "tokenizer_fertility",
        "temporal_trend_fp",
        # r5 fifth wave: detection-box curation + watershed basins
        "box_iou_pairs",
        "box_suppress_keep",
        "box_nms_fp",
        "box_match_fp",
        "box_ap_fp",
        "basin_labels_fp",
        # r5 sixth wave: instance-mask curation
        "mask_rle_fp",
        "mask_iou_pairs_fp",
        "box_fusion_fp",
        "panoptic_pq_fp",
        # r5 seventh wave: adaptive tiling + coverage QA + rasterization
        "quadtree_leaves",
        "box_union_area",
        "score_calibration_fp",
        "rasterize_lines_fp",
        # r5 eighth wave: STR packing, histogram matching, DTW join
        "str_pack_pages",
        "hist_match_lut",
        "dtw_pairs",
        # r5 ninth wave: vision-training image ops (real decode path)
        "augment_fp",
        "vit_patches_fp",
        "cutmix_fp",
        # r5 tenth wave: web-corpus image curation filters
        "blur_scores_fp",
        "crossmodal_filter",
        "image_exact_dups",
        "aspect_bucket_stats",
        "exposure_stats_fp",
        # r5 eleventh wave: DQT quality recovery, areal overlay, FID moments
        "jpeg_quality_fp",
        "areal_interp",
        "fid_moments",
        # r5 twelfth wave: geostatistics, space-time trend, entropy gate
        "empirical_variogram",
        "ripley_k",
        "mann_kendall_trend",
        "entropy_gate_fp",
        # r5 thirteenth wave: Borůvka MSF, co-registration, spherical area
        "mst_edges",
        "coregister_shift",
        "spherical_area",
        # r5 fourteenth wave: kriging, bilinear overzoom, traj resampling
        "kriging_surface",
        "overzoom_fp",
        "traj_resample",
        # r5 fifteenth wave: KDE heatmap, binomial pyramid, solar angles
        "kde_surface",
        "gauss_pyramid_fp",
        "solar_angles",
        # r5 sixteenth wave: LISA hot spots, deviational ellipse
        "hotspot_gi",
        "sde_ellipse",
        # r5 seventeenth wave: GLCM texture, cloud-shadow projection
        "glcm_texture_fp",
        "shadow_mask_fp",
        # r5 eighteenth wave: geohash index, sensor stripe QA
        "geohash_buckets",
        "stripe_qa_fp",
        # r5 nineteenth wave: Web-Mercator covers, quadkeys
        "slippy_cover_fp",
        "quadkey_encode",
        # r5 twentieth wave: trajectory kinematics, space-time cube
        "traj_kinematics",
        "spacetime_cube",
        # r5 twenty-first wave: GeoTIFF + COG codec round trips
        "geotiff_rt_fp",
        "cog_rt_fp",
        # r5 twenty-second wave: hexagonal cell index
        "hex_buckets",
        "hex_kring_join",
        # r5 twenty-third wave: S2-style cube-face index
        "s2_cover_fp",
        # r5 closing wave 31: Harris corners, seam QA, bicubic overzoom
        "harris_fp",
        "seam_qa_fp",
        "bicubic_overzoom_fp",
        "pyramid_audit_fp",
        "majority_filter_fp",
    ]
    from data_model_spark.cache import unpersist_tracked

    registry = all_queries()
    join_rows = 0
    for name in headline:
        spec = registry[name]
        join_rows += timed_median(
            name,
            lambda s=spec: s.spark_fn(spark, sf_dir).count(),
            cleanup=unpersist_tracked,  # release query-private caches per rep
        )
    join_s = sum(timings[n] for n in headline)
    extras["join_rows_per_sec"] = round(join_rows / max(join_s, 1e-9), 1)
    extras["cores"] = cores
    extras["reps"] = reps

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "tiles+join-rows/sec flagship pipeline + headline operators",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
