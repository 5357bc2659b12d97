"""Deterministic sampling: reproducibility, stratification, funnel logic."""

import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import sampling as smp
from data_model_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").cache()


def test_hash_sample_is_layout_independent(spark, docs):
    a = {r["doc_id"] for r in smp.hash_sample(docs, 0.3).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in smp.hash_sample(docs.repartition(7, "lang"), 0.3)
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_hash_sample_rate_roughly_holds(spark, docs):
    n = docs.count()
    got = smp.hash_sample(docs, 0.5).count()
    assert abs(got / n - 0.5) < 0.1


def test_seed_changes_selection(spark, docs):
    a = {r["doc_id"] for r in smp.hash_sample(docs, 0.4, seed="s0").collect()}
    b = {r["doc_id"] for r in smp.hash_sample(docs, 0.4, seed="s1").collect()}
    assert a != b


def test_stratified_rates_respected(spark, docs):
    rates = {"en": 1.0, "zh": 0.0}
    out = smp.stratified_hash_sample(docs, rates)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_en = docs.filter("lang = 'en'").count()
    assert got.get("en") == n_en  # rate 1.0 keeps everything
    assert "zh" not in got  # rate 0.0 keeps nothing
    assert "fr" not in got  # unlisted stratum -> default_rate 0.0


def test_stratified_topn_exact_counts_and_determinism(spark, docs):
    out = smp.stratified_topn(docs, 7)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert counts == {s: 7 for s in strata}
    again = smp.stratified_topn(docs.repartition(13), 7)
    assert sorted((r["lang"], r["doc_id"]) for r in out.collect()) == sorted(
        (r["lang"], r["doc_id"]) for r in again.collect()
    )


def test_topn_small_stratum_returns_all(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, lang string"
    )
    assert smp.stratified_topn(df, 10).count() == 3


def test_curation_keep_is_conjunction(spark, docs):
    out = smp.curation_flags(docs, {"en": 1.0, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}).cache()
    assert out.count() == docs.count()
    bad = out.filter(
        F.col("keep")
        != (F.col("len_ok") & F.col("punct_ok") & F.col("uniq") & F.col("sampled"))
    ).count()
    assert bad == 0
    # with all rates 1.0 sampling never drops; some docs still fail len/uniq
    assert out.filter("NOT sampled").count() == 0
    assert out.filter("NOT uniq").count() > 0
    assert out.filter("NOT len_ok").count() > 0
    out.unpersist()


def test_topn_plan_uses_window_group_limit(spark, docs):
    plan = smp.stratified_topn(docs, 5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


class TestWeightedSample:
    def test_deterministic_and_parallelism_independent(self, spark):
        from data_model_spark.operators.sampling import weighted_sample

        rows = [(i, (i * 7) % 100 + 1) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        a = weighted_sample(df.coalesce(1), 20, "w").collect()
        b = weighted_sample(df.repartition(32), 20, "w").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert len(a) == 20

    def test_weight_bias(self, spark):
        # two strata: weight 100 vs weight 1; the heavy stratum must
        # dominate the sample across independent seeds
        from data_model_spark.operators.sampling import weighted_sample

        rows = [(i, 100 if i < 250 else 1) for i in range(500)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        heavy = 0
        for seed in ("a", "b", "c"):
            got = weighted_sample(df, 40, "w", seed=seed).collect()
            heavy += sum(1 for r in got if r.w == 100)
        assert heavy > 0.8 * 120  # E[heavy] ~ 40*100/(100*frac...) >> 0.8

    def test_plan_is_global_topk(self, spark):
        from data_model_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame([(i, i + 1) for i in range(100)],
                                   "doc_id long, w long")
        plan = weighted_sample(df, 5, "w")._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan  # never a full global sort
