"""Shared query registry: name -> (Spark callable, DuckDB oracle SQL | None).

Populated by importing the operator modules; consumed by
``__spark_entry__.queries()/oracle_sql()`` and the local parity harness.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    # str -> oracle SQL; callable -> lazy oracle builder (resolved once on
    # first access, for oracles whose literal tables are expensive to
    # derive at import time); None -> rows-only check (non-SQL-expressible)
    _oracle: str | Callable[[], str] | None

    @property
    def oracle(self) -> str | None:
        if callable(self._oracle):
            self._oracle = self._oracle()
        return self._oracle

    @property
    def has_oracle(self) -> bool:
        """Oracle-backed? — without forcing a lazy builder to resolve."""
        return self._oracle is not None


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | Callable[[], str] | None):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle)
        return fn

    return deco


# Explicit presentation order for ``all_queries()``.  External harnesses may
# sample a PREFIX of the registry (e.g. the first 50 entries), so the order is
# a coverage decision, not cosmetics: queries whose correctness evidence is
# thinnest (spatial / ANN / text suites, warp, validation) go first, then new
# queries, then the most load-bearing already-verified queries.  Names absent
# from this list keep registration order after the listed ones; names listed
# but not registered are ignored (keeps the list robust to refactors).
PRIORITY_ORDER: list[str] = [
    # window policy for the r5 run: the 19 queries that have NEVER received
    # a driver CORRECTNESS row (r4 second wave, positions 51+ last round)
    # go first — VERDICT r4 item #1.  New r5 queries follow, then backfill
    # ordered by evidence staleness: the 43 queries whose latest green row
    # is CORRECTNESS_r02 outrank r3/r4-green rows.
    # -- never driver-checked (oracle-backed first) --
    "semdedup_keep",
    "kcore_nodes",
    "interval_overlap_join",
    "fuzzy_name_pairs",
    "funnel_depths",
    "bpe_train_merges",
    # -- never driver-checked (rows-only, pytest-pinned) --
    "traj_simplify",
    "traj_stay_points",
    "flow_dir_tiles",
    "flow_accum_tiles",
    "contour_tiles",
    "raster_regions",
    "raster_region_stats",
    "cost_distance_tiles",
    "hillshade_tiles",
    "otsu_mosaic",
    "equalize_mosaic",
    "zonal_stats_poly",
    "focal_mean",
    # -- new round-5 queries (added this session) --
    "zonal_stats_fp",
    "tile_render_fp",
    "bpe_encode_tokens",
    "resume_tile_write_fp",
    "streaming_tiles_fp",
    "zarr_store_meta",
    "zarr_sharded_rt",
    "geozarr_sharded_rt",
    "store_layout_validate",
    "ann_recall_planted",
    "geozarr_store_rt",
    "quantized_recall",
    "hard_negatives",
    "pack_sequences",
    # window policy: slots 41-46 of the driver's 50-query window go to the
    # fourth-wave operators (brand-new surfaces with no driver row at
    # all); the six displaced terrain/CCL hash twins keep their rows-only
    # ORIGINALS inside the window (the 19 above) plus local parity runs —
    # double driver coverage for them is worth less than first driver
    # coverage for new operators
    "median_composite_fp",
    "feather_blend_fp",
    "morph_gradient_fp",
    "morph_open_fp",
    "leakage_free_split",
    "viewshed_fp",
    # -- round-5 fifth wave: detection-box curation + watershed basins
    # (brand-new surfaces; take five window slots from mosaic hash twins
    # whose rows-only ORIGINALS already sit in the window at positions
    # 9-19, keeping driver coverage for every kernel) --
    "box_iou_pairs",
    "box_nms_fp",
    "box_match_fp",
    "box_ap_fp",
    "basin_labels_fp",
    # -- round-5 sixth wave: instance-mask curation (RLE, exact mask IoU,
    # weighted box fusion, panoptic quality).  Window policy: these four
    # take the slots of flow_dir_fp / flow_accum_fp / focal_mean_fp /
    # hillshade_fp — hash twins whose rows-only ORIGINALS already sit in
    # the window at positions 9-19 (kernels keep driver coverage there;
    # the twins keep local parity + pytest) — first driver coverage for
    # a brand-new surface beats a second channel for a pinned kernel --
    "mask_rle_fp",
    "mask_iou_pairs_fp",
    "box_fusion_fp",
    "panoptic_pq_fp",
    # -- round-5 seventh wave: adaptive quadtree tiling + detection
    # coverage, both GENERATIVE-SQL-oracle-backed (the oracle re-runs
    # the full relational pipeline in DuckDB, not a VALUES replay).
    # They take the slots of bpe_train_fp / gcp_warp_fp — twins whose
    # subjects already carry oracle evidence (bpe_train_merges is
    # oracle-backed IN this window; gcp warp has the r3-green
    # gcp_overview_gcps oracle + exact NumPy goldens) --
    "quadtree_leaves",
    "box_union_area",
    # box_suppress_keep sits just past the 50-slot window: it is a
    # relational composition of box_iou_pairs (in-window) and its oracle
    # is plain SQL, so local parity + the chain pytest carry it
    "box_suppress_keep",
    # sixth/seventh-wave remainder just past the window (local parity +
    # pytest): calibration/rasterize are kernel-VALUES twins; the four
    # displaced hash twins keep their in-window rows-only originals
    "score_calibration_fp",
    "rasterize_lines_fp",
    # -- round-5 eighth wave (past the window; SQL oracles + local
    # parity): STR R-tree packing, histogram matching, DTW join --
    "str_pack_pages",
    "hist_match_lut",
    "dtw_pairs",
    # -- round-5 ninth wave (past the window; replay oracles + local
    # parity): vision-training image ops over real decoded bytes --
    "augment_fp",
    "vit_patches_fp",
    "cutmix_fp",
    # -- round-5 tenth wave (past the window; replay + SQL oracles + local
    # parity): web-corpus image curation filters --
    "blur_scores_fp",
    "crossmodal_filter",
    "image_exact_dups",
    "aspect_bucket_stats",
    "exposure_stats_fp",
    # -- round-5 eleventh wave (past the window; two generative SQL
    # oracles + one replay oracle + local parity): DQT-based JPEG quality
    # recovery, areal interpolation, Fréchet/FID moment sweep --
    "jpeg_quality_fp",
    "areal_interp",
    "fid_moments",
    # -- round-5 twelfth wave (past the window; three generative SQL
    # oracles + one replay oracle + local parity): variogram, Ripley K,
    # Mann-Kendall trend, image entropy gate --
    "empirical_variogram",
    "ripley_k",
    "mann_kendall_trend",
    "entropy_gate_fp",
    # -- round-5 thirteenth wave (past the window; replay oracles + local
    # parity): Borůvka minimum spanning forest, scene co-registration,
    # spherical polygon area --
    "mst_edges",
    "coregister_shift",
    "spherical_area",
    # -- round-5 fourteenth wave (past the window; one generative SQL
    # oracle + two replay oracles + local parity): ordinary kriging,
    # bilinear overzoom, trajectory time-resampling --
    "kriging_surface",
    "overzoom_fp",
    "traj_resample",
    # -- round-5 fifteenth wave (past the window; one generative SQL
    # oracle + two replay oracles + local parity): Epanechnikov KDE
    # heatmap, binomial Gaussian pyramid, NOAA solar geometry --
    "kde_surface",
    "gauss_pyramid_fp",
    "solar_angles",
    # -- round-5 sixteenth wave (past the window; two generative SQL
    # oracles + local parity): Getis-Ord Gi* / local Moran LISA pair,
    # standard deviational ellipse --
    "hotspot_gi",
    "sde_ellipse",
    # -- round-5 seventeenth wave (past the window; two replay oracles +
    # local parity): GLCM texture screen, cloud-shadow projection --
    "glcm_texture_fp",
    "shadow_mask_fp",
    # -- round-5 eighteenth wave (past the window; two generative SQL
    # oracles + one replay oracle + local parity): geohash encode/buckets,
    # sensor stripe QA --
    "geohash_encode",
    "geohash_buckets",
    "stripe_qa_fp",
    # -- round-5 nineteenth wave (past the window; one generative SQL
    # oracle + one replay oracle + local parity): Web-Mercator XYZ tile
    # covers, Bing quadkeys --
    "slippy_cover_fp",
    "quadkey_encode",
    # -- round-5 twentieth wave (past the window; two generative SQL
    # oracles + local parity): trajectory kinematics QA, space-time cube --
    "traj_kinematics",
    "spacetime_cube",
    # -- round-5 twenty-first wave (past the window; replay oracles +
    # local parity): from-spec GeoTIFF + COG codec round trips --
    "geotiff_rt_fp",
    "cog_rt_fp",
    # -- round-5 twenty-second wave (past the window; four generative SQL
    # oracles + local parity): hexagonal cell index — axial encode with
    # exact cube rounding, bucket histogram, k-ring candidate join,
    # coarse-pitch rollup --
    "hex_encode",
    "hex_buckets",
    "hex_kring_join",
    "hex_rollup",
    # -- round-5 twenty-third wave (past the window; two replay oracles +
    # local parity): S2-style cube-face quadtree index — point cells and
    # exact footprint cell-range covers --
    "s2_cells_fp",
    "s2_cover_fp",
    # -- round-5 twenty-fourth wave (past the window; generative SQL
    # oracle + local parity): Theil-Sen median slope per series --
    "theil_sen_slope",
    # -- round-5 twenty-fifth wave (past the window; replay oracle +
    # local parity): Hough line peak per tile --
    "hough_peak_fp",
    # -- round-5 twenty-sixth wave (past the window; generative SQL
    # oracle + local parity): HyperANF reachability sketches --
    "hyperanf_reach",
    # -- round-5 twenty-seventh wave (past the window; replay oracle +
    # local parity): exact squared Euclidean distance transform --
    "edt_fp",
    # -- round-5 twenty-eighth wave (past the window; replay oracle +
    # local parity): Kleinberg burst detection per term stream --
    "burst_detect_fp",
    # -- round-5 twenty-ninth wave (past the window; generative SQL
    # oracle + local parity): seasonal decomposition per series --
    "seasonal_profile",
    # -- round-5 thirtieth wave (past the window; replay oracle + local
    # parity): integer-exact Brovey pan-sharpening over the 4-way
    # co-keyed band-tile join --
    "brovey_sharpen_fp",
    # -- round-5 closing wave 31 (past the window; replay-VALUES oracles
    # + local parity + pytest goldens): Harris corner screen, mosaic
    # seam QA (edge-strip adjacency join), exact bicubic overzoom --
    "harris_fp",
    "seam_qa_fp",
    "bicubic_overzoom_fp",
    "pyramid_audit_fp",
    "majority_filter_fp",
    "bpe_train_fp",
    "gcp_warp_fp",
    "flow_dir_fp",
    "flow_accum_fp",
    "focal_mean_fp",
    "hillshade_fp",
    "contour_fp",
    "cost_distance_fp",
    "otsu_mosaic_fp",
    "equalize_fp",
    "raster_regions_fp",
    "raster_region_stats_fp",
    "image_features_fp",
    "image_thumbnails_fp",
    "image_validation_fp",
    "audio_features_fp",
    "video_frame_sample_fp",
    "zonal_stats_poly_fp",
    "traj_simplify_fp",
    "traj_stay_points_fp",
    "tile_bbox_query_fp",
    "tile_point_query_fp",
    # -- round-5 third wave (layout / pipeline-QA / quality) --
    "zorder_regions",
    "pii_scrub_stats",
    "domain_mix_weights",
    "lsh_pr_stats",
    "ssim_tiles_fp",
    "hilbert_regions",
    "emb_gramian",
    "segment_intersections",
    "curation_pipeline",
    "cusum_changepoints",
    "curriculum_buckets",
    "lpa_communities",
    "source_similarity",
    "od_flows",
    "polygon_metrics",
    "dataset_card",
    "scd2_asof",
    "k_anonymity_audit",
    "negative_edges",
    "range_boundaries",
    "cell_skew_audit",
    "dedup_delta_pairs",
    "cell_rollup_counts",
    # -- round-5 fourth wave remainder (main block sits in the window) --
    "stac_items",
    "split_leakage_audit",
    "tokenizer_fertility",
    "temporal_trend_fp",
    # -- stalest evidence backfill: latest green row is r2 --
    "asof_event_order",
    "asof_range",
    "anti_join_refs",
    "bbox_agg",
    "block_avg",
    "bool_or_agg",
    "broadcast_dim",
    "caption_token_stats",
    "center_pick",
    "cf_scale_offset",
    "clamped_avg",
    "compliance_counts",
    "cond_avg",
    "dispatch_case",
    "epsg_parse",
    "except_paths",
    "filter_in_list",
    "filter_prefix",
    "gcp_dedup",
    "global_topk",
    "grouping_cube",
    "grouping_rollup",
    "inject_join",
    "json_pred",
    "map_ops",
    "nan_canon",
    "null_avg",
    "pyramid_cascade",
    "ref_integrity",
    "semi_anti",
    "stride_filter",
    "summary_counts",
    "topk_window",
    "two_phase_avg",
    "union_bbox",
    "union_pivot",
    "validity_pred",
    "audio_features",
    "image_features",
    "image_thumbnails",
    "streaming_event_windows",
    "streaming_tiles",
    "video_frame_sample",
    # -- r3-green backfill --
    "pip_rect_join",
    "pip_cell_join",
    "knn_bruteforce",
    "cell_cover_counts",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ivf_cell_counts",
    "emb_neardup_pairs",
    "token_count",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "doc_fingerprint_md5",
    "gcp_warp",
    "gcp_overview_gcps",
    "path_parse",
    "image_validation",
    "layout_validate",
    "pyramid_layout_meta",
    "store_root_bbox",
    "tile_point_query",
    "tile_bbox_query",
    "product_detect",
    "flagship_multiband",
    "resume_tile_write",
    "wav_audio_features",
    "y4m_frame_sample",
    "dedup_components",
    "dedup_canonical",
    "ivf_kmeans_assign",
    "stratified_sample",
    "stratified_topn",
    "curation_keep",
    "length_profile",
    "vocab_topk",
    "streaming_dedup",
    "sessionize",
    "streaming_sessions",
    "cohort_retention",
    "token_count_bpe",
    "image_size_profile",
    "decontaminate",
    "repetition_stats",
    "consolidate_s2",
    "dedup_exact",
    "phash_neardup_pairs",
    # -- r4-green backfill (freshest evidence, lowest priority) --
    "knn_cells",
    "emb_neardup_lsh_pairs",
    "dedup_exact_pairs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "coord_attr_templates",
    "tile_render",
    "cell_compact",
    "mask_boundary_cells",
    "pyramid_dirty_tiles",
    "trajectory_cell_cover",
    "idw_surface",
    "zonal_stats",
    "temporal_composite",
    "w1_source_drift",
    "band_ndi",
    "change_detect",
    "sssp_khop",
    "joint_neardup_pairs",
    "radius_pairs",
    "dbscan_clusters",
    "lm_perplexity",
    "cms_heavy_hitters",
    "hll_distinct_shingles",
    "polygon_overlay",
    "pagerank_trade",
    "convex_hull_vertices",
    "bm25_scores",
    "skyline_docs",
    "streaming_enrich_join",
    "geohash_points",
    "convoy_pairs",
    "weighted_sample",
    "quadkey_tiles",
    "snapshot_diff",
    "triangle_counts",
    "cell_heatmap",
    "pmi_collocations",
    "phrase_search",
    "char_entropy",
    "dsir_weights",
    "dup_span_stats",
    "morans_i",
    "gi_star_hotspots",
    "hausdorff_pairs",
    "map_match",
    "pq_codes",
    "scd2_history",
    "otsu_events",
]


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return all.

    Ordered by ``PRIORITY_ORDER`` first (coverage-critical queries up front),
    then remaining registrations in import order.
    """
    from . import (  # noqa: F401
        augment,
        autocorr,
        basins,
        boundaries,
        boxes,
        bpe,
        bursts,
        ccl,
        components,
        cell_rollup,
        composite,
        changepoint,
        consolidate,
        contours,
        contrastive,
        costdist,
        curriculum,
        dataset_card,
        dbscan,
        decontaminate,
        dedup,
        dedup_delta,
        dedup_qa,
        drift,
        dsir,
        dtw,
        edt,
        areal,
        fid,
        funnel,
        fuzzy,
        geostats,
        gramian,
        jpeg_qa,
        mannkendall,
        harris,
        histmatch,
        hough,
        hull,
        majority,
        pyramid_audit,
        seams,
        hyperanf,
        hydrology,
        intervals,
        ivf_kmeans,
        kcore,
        layout,
        lm,
        lpa,
        mapmatch,
        masks,
        media_fp,
        mixing,
        morphology,
        mosaic_fp,
        mst,
        coregister,
        spherical,
        kriging,
        upsample,
        resample,
        gausspyr,
        solar,
        hotspot,
        sde,
        texture,
        shadow,
        geohash,
        hexgrid,
        s2grid,
        stripes,
        webmercator,
        kinematics,
        geotiff_io,
        overlay_segments,
        packing,
        multimodal,
        negatives,
        od_flows,
        pagerank,
        pansharpen,
        pii,
        pipeline_queries,
        pipeline_curation,
        polygon_metrics,
        coverage,
        pq,
        privacy,
        profile,
        quadtree,
        quality,
        rasterize,
        recall,
        relational,
        render,
        reproject,
        sampling,
        scd,
        search,
        seasonal,
        semdedup,
        sessions,
        similarity,
        skew_audit,
        skyline,
        snapshot,
        sketches,
        source_sim,
        split_audit,
        splits,
        stac,
        str_pack,
        sssp,
        spatial_queries,
        substrings,
        text,
        theilsen,
        threshold,
        trajectory,
        triangles,
        validate,
        viewshed,
        vision_curation,
        zarr_queries,
        zarr_sink,
    )

    ordered: dict[str, QuerySpec] = {}
    for name in PRIORITY_ORDER:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered
