"""Physical-plan regression gates: the optimizations stay IN the plan.

Correctness tests prove the right rows come back; these prove the right
PLAN produces them — filter/column pushdown reaching the parquet scan,
small dims broadcast, rank-limit pushdown, whole-stage codegen on the hot
relational paths, and partition-count invariants.  At 100 TB a silently
regressed pushdown is a full-table scan; this file makes that a test
failure instead of a production incident.
"""

import pytest

from data_model_spark.operators.registry import all_queries

QUERIES = all_queries()
SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str, execute: bool = False) -> str:
    """Physical plan string; ``execute=True`` materializes first so AQE's
    final plan (with WholeStageCodegen spans) is what's inspected."""
    df = QUERIES[name].spark_fn(spark, SF)
    if execute:
        df.collect()  # count() would execute a different (count-agg) plan
    return df._jdf.queryExecution().executedPlan().toString()


class TestPushdown:
    def test_prefix_filter_pushed_to_scan(self, spark):
        plan = plan_of(spark, "filter_prefix")
        assert "PushedFilters" in plan and "StartsWith" in plan

    def test_column_pruning_reaches_scan(self, spark):
        plan = plan_of(spark, "filter_prefix")
        # 2-column projection of a 9-column table: ReadSchema must be pruned
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert read and "p_partkey" in read[0] and "p_retailprice" not in read[0]

    def test_in_list_pushed(self, spark):
        plan = plan_of(spark, "filter_in_list")
        assert "PushedFilters: [" in plan and "In(" in plan


class TestJoinStrategy:
    def test_dim_join_broadcasts(self, spark):
        plan = plan_of(spark, "broadcast_dim")
        assert "BroadcastHashJoin" in plan

    def test_knn_candidates_broadcast(self, spark):
        # query-ring side is tiny; the point corpus must NOT shuffle for it
        plan = plan_of(spark, "knn_cells")
        assert "BroadcastHashJoin" in plan

    def test_knn_grow_proof_is_plan_side(self, spark):
        # VERDICT r4 #6: the grow proof predicate runs as column arithmetic
        # + anti-join of the proven set — per-query stats stay on the
        # executors.  Force a grow round (one query, k bigger than the
        # ring-1 candidate set) and assert the proven-set semi-join made it
        # into the final plan instead of a driver-collected id list.
        from data_model_spark.operators import spatial as S

        pts = spark.createDataFrame(
            [(i, 10.0 + i * 0.9, 46.0) for i in range(8)],
            "point_id long, lon double, lat double",
        )
        qs = spark.createDataFrame(
            [(0, 10.0, 46.0)], "query_id long, lon double, lat double"
        )
        df = S.knn_join(pts, qs, k=6, res=7, ring=1, grow=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan and "Union" in plan
        assert df.count() == 6  # the grow rounds found all 6

    def test_semi_anti_planned_as_joins(self, spark):
        plan = plan_of(spark, "semi_anti")
        assert "LeftSemi" in plan or "LeftAnti" in plan


class TestAggAndWindow:
    def test_block_avg_has_partial_agg(self, spark):
        # partial_avg before the exchange = map-side combine
        plan = plan_of(spark, "block_avg")
        assert "partial_avg" in plan or "partial_" in plan

    def test_topk_rank_limit_pushdown(self, spark):
        plan = plan_of(spark, "topk_window")
        assert "WindowGroupLimit" in plan

    def test_relational_paths_whole_stage_codegen(self, spark):
        # "*(n)" is the WholeStageCodegen stage marker in plan strings
        for name in ("block_avg", "validity_pred", "summary_counts"):
            assert "*(" in plan_of(spark, name, execute=True), name


class TestNoDriverLoops:
    def test_flagship_tile_pipeline_single_shuffle(self, spark):
        """generate -> decode -> cut -> merge is narrow + exactly one
        hash-shuffle into the merge (the plan audited in VERDICT r1)."""
        from data_model_spark.operators import tiling
        from data_model_spark.plans.bucketing import count_exchanges
        from data_model_spark.sources.images import generate_images_df

        imgs = generate_images_df(spark, 8)
        merged = tiling.merge_tiles(tiling.build_tiles(imgs, repartition=False))
        assert count_exchanges(merged) <= 1


class TestPartitionPruning:
    def test_level_filter_prunes_partitions(self, spark, tmp_path):
        """The tile table is partitioned by level; a level filter must reach
        the scan as a PartitionFilter (directory pruning), not a row filter
        — at 100 TB this is the difference between reading one pyramid
        level and reading all of them."""
        from pyspark.sql import functions as F

        out = str(tmp_path / "tiles")
        df = spark.range(0, 3000).select(
            (F.col("id") % 3).alias("level"),
            F.col("id").alias("tile_x"),
            (F.col("id") * 2).alias("tile_y"),
        )
        df.write.mode("overwrite").partitionBy("level").parquet(out)
        q = spark.read.parquet(out).filter(F.col("level") == 1)
        q.collect()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "level" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0]
        # the pruned scan reads 1 of 3 level directories
        assert q.count() == 1000


class TestRound3Additions:
    def test_stratified_topn_group_limit(self, spark):
        plan = plan_of(spark, "stratified_topn")
        assert "WindowGroupLimit" in plan

    def test_vocab_topk_partial_agg_and_group_limit(self, spark):
        plan = plan_of(spark, "vocab_topk")
        assert "partial_count" in plan or "partial count" in plan.lower()
        assert "WindowGroupLimit" in plan

    def test_sampling_rate_table_broadcasts(self, spark):
        plan = plan_of(spark, "stratified_sample")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan

    def test_curation_no_cartesian(self, spark):
        plan = plan_of(spark, "curation_keep")
        assert "CartesianProduct" not in plan

    def test_kmeans_assign_single_narrow_stage(self, spark):
        # assignment carries the k-row centroid table as a kernel closure:
        # no cartesian, no join, no exchange — one Arrow stage over the scan
        plan = plan_of(spark, "ivf_kmeans_assign")
        assert "CartesianProduct" not in plan
        assert "Join" not in plan
        assert "Exchange" not in plan
        assert "ArrowEvalPython" in plan

    def test_sessionize_single_user_shuffle(self, spark):
        # lag + running-sum + final agg all share the user_id clustering:
        # exactly ONE shuffle exchange in the whole plan
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["sessionize"].spark_fn(spark, SF)
        assert count_exchanges(df) == 1

    def test_cohort_retention_join_not_hint_forced(self, spark):
        # the per-user cohort table grows with the data, so the join must
        # NOT carry a broadcast HINT: at test scale the cost model still
        # picks broadcast (size-estimated — fine), but at 10^12 rows the
        # same code must be free to shuffle.  Hints survive into the
        # analyzed logical plan; assert none is present.
        df = QUERIES["cohort_retention"].spark_fn(spark, SF)
        logical = df._jdf.queryExecution().analyzed().toString()
        assert "Hint" not in logical
        assert "CartesianProduct" not in plan_of(spark, "cohort_retention")

    def test_canonical_docs_join_not_hint_forced(self, spark):
        # VERDICT r4 #2: comps grows with the dup rate — no forced broadcast
        df = QUERIES["dedup_canonical"].spark_fn(spark, SF)
        logical = df._jdf.queryExecution().analyzed().toString()
        assert "Hint" not in logical

    def test_bpe_token_count_stays_in_codegen(self, spark):
        # '*(n)' prefixes are the codegen markers in shuffle-free plans
        # (no AQE wrapper -> no literal 'WholeStageCodegen' node name)
        plan = plan_of(spark, "token_count_bpe", execute=True)
        assert ("WholeStageCodegen" in plan or "*(1)" in plan)
        assert "BatchEvalPython" not in plan


class TestRound4Additions:
    def test_interval_join_no_cartesian(self, spark):
        plan = plan_of(spark, "interval_overlap_join")
        assert "CartesianProduct" not in plan and "SortMergeJoin" in plan or \
            "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan

    def test_fuzzy_join_no_cartesian_and_pruned_scan(self, spark):
        plan = plan_of(spark, "fuzzy_name_pairs")
        assert "CartesianProduct" not in plan
        read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        # 2-column projection of the 8-column customer table
        assert read and "c_name" in read[0] and "c_acctbal" not in read[0]

    def test_convoy_join_keyed_on_bucket_and_cell(self, spark):
        plan = plan_of(spark, "convoy_pairs")
        assert "CartesianProduct" not in plan

    def test_sssp_round_min_partial_and_no_cartesian(self, spark):
        # inspect ONE round pre-checkpoint (the checkpoint collapses the
        # final plan to Scan ExistingRDD)
        from data_model_spark.operators.sssp import (
            _relax_round,
            _weighted_trade_edges,
        )

        e = _weighted_trade_edges(spark, SF)
        dist = spark.createDataFrame([(1, 0)], "node long, dist long")
        plan = _relax_round(e, dist)._jdf.queryExecution().executedPlan().toString()
        assert "partial_min" in plan  # map-side combine before the dst shuffle
        assert "CartesianProduct" not in plan

    def test_w1_lattice_and_sizes_broadcast(self, spark):
        plan = plan_of(spark, "w1_source_drift")
        assert plan.count("BroadcastHashJoin") >= 2  # lattice + sizes
        assert "CartesianProduct" not in plan

    def test_otsu_totals_broadcast(self, spark):
        plan = plan_of(spark, "otsu_events")
        assert "BroadcastNestedLoopJoin" in plan  # 1-row totals crossJoin
        # bounded single-partition stages only: the <=65536-row cum
        # window and the 1-row totals aggregate
        assert 1 <= plan.count("Exchange SinglePartition") <= 2

    def test_kcore_round_count_partial_and_semi_joins(self, spark):
        from data_model_spark.operators.kcore import (
            _peel_round,
            _sparse_trade_edges,
        )

        e = _sparse_trade_edges(spark, SF)
        plan = _peel_round(e, 8)._jdf.queryExecution().executedPlan().toString()
        assert "partial_count" in plan
        assert plan.count("LeftSemi") >= 2
        assert "CartesianProduct" not in plan


class TestShardedSinkPlan:
    def test_sharded_write_single_extra_shuffle_and_broadcast_extents(
        self, spark, tmp_path
    ):
        """The shard-grouped write adds exactly ONE shuffle (the shard-key
        groupBy) on top of the merge shuffle, and the extents table joins
        as a broadcast — never a shuffle join against the tile table."""
        from data_model_spark.operators import tiling, zarr_sink
        from data_model_spark.plans.bucketing import count_exchanges
        from data_model_spark.sources.images import generate_images_df

        imgs = generate_images_df(spark, 8)
        merged = tiling.merge_tiles(tiling.build_tiles(imgs, repartition=False))
        manifest = zarr_sink.write_geozarr(
            merged, str(tmp_path / "s.zarr"), shard_tiles=2
        )
        plan = manifest._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
        # merge shuffle + shard-key shuffle + the broadcast exchange only
        assert count_exchanges(manifest) <= 3
        assert "SortMergeJoin" not in plan


class TestRound5ThirdWave:
    def test_pii_scrub_has_no_shuffle(self, spark):
        # redaction is a pure narrow projection: regexp work stays in one
        # codegen stage; any Exchange here is a planning regression
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["pii_scrub_stats"].spark_fn(spark, SF)
        assert count_exchanges(df) == 0
        plan = plan_of(spark, "pii_scrub_stats", execute=True)
        # "*(n)" prefixes mark whole-stage-codegen stages in the plan string
        assert "*(1)" in plan
        assert "BatchEvalPython" not in plan  # no row-at-a-time Python

    def test_zorder_regions_single_agg_shuffle(self, spark):
        # Morton interleave is column arithmetic (codegen); the only wide
        # op is the region groupBy (partial agg map-side)
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["zorder_regions"].spark_fn(spark, SF)
        assert count_exchanges(df) <= 1
        plan = plan_of(spark, "zorder_regions", execute=True)
        assert "partial_count" in plan or "HashAggregate" in plan

    def test_domain_mix_single_count_shuffle(self, spark):
        # one combinable count agg; the window runs on the tiny per-source
        # table (single extra exchange at most)
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["domain_mix_weights"].spark_fn(spark, SF)
        assert count_exchanges(df) <= 3
        assert "CartesianProduct" not in plan_of(spark, "domain_mix_weights")

    def test_lsh_pr_no_cartesian(self, spark):
        from data_model_spark.operators.dedup import unpersist_intermediates

        try:
            plan = plan_of(spark, "lsh_pr_stats")
        finally:
            unpersist_intermediates()
        assert "CartesianProduct" not in plan

    def test_segment_join_no_cartesian_keyed_on_cells(self, spark):
        plan = plan_of(spark, "segment_intersections")
        assert "CartesianProduct" not in plan
        assert "cell_x" in plan and "cell_y" in plan  # the candidate key

    def test_gramian_single_partial_agg_shuffle(self, spark):
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["emb_gramian"].spark_fn(spark, SF)
        assert count_exchanges(df) <= 1  # 2,080-row partials, one agg

    def test_od_flows_two_bounded_shuffles(self, spark):
        # one window on the track key + one count on the OD key
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["od_flows"].spark_fn(spark, SF)
        assert count_exchanges(df) <= 2

    def test_curation_pipeline_no_cartesian(self, spark):
        from data_model_spark.operators.dedup import unpersist_intermediates

        try:
            plan = plan_of(spark, "curation_pipeline")
        finally:
            unpersist_intermediates()
        assert "CartesianProduct" not in plan

    def test_cusum_totals_broadcast_and_group_limit(self, spark):
        plan = plan_of(spark, "cusum_changepoints", execute=True)
        assert "CartesianProduct" not in plan
        assert "WindowGroupLimit" in plan  # the top-1 pick stays bounded

    def test_median_composite_single_shuffle(self, spark):
        # fragments hash-repartition once on the tile key; the composite
        # kernel streams inside mapInPandas — no second exchange
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["median_composite_fp"].spark_fn(spark, SF)
        assert count_exchanges(df) == 1

    def test_feather_blend_single_shuffle(self, spark):
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["feather_blend_fp"].spark_fn(spark, SF)
        assert count_exchanges(df) == 1

    def test_morph_opening_bounded_exchanges(self, spark):
        # merge (1) + erode halo exchange (1) + dilate halo exchange (1):
        # the chain must not introduce extra wide ops
        from data_model_spark.plans.bucketing import count_exchanges

        df = QUERIES["morph_open_fp"].spark_fn(spark, SF)
        assert count_exchanges(df) <= 3

    def test_viewshed_cover_broadcast(self, spark):
        # the observer-window cover table must broadcast (tiles stream);
        # per-observer grouping is the only hash shuffle
        plan = plan_of(spark, "viewshed_fp")
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
