"""k-anonymity audit + SCD2 as-of reconstruction invariants."""

from pyspark.sql import functions as F

from data_model_spark.operators.privacy import K, k_anonymity_violations
from data_model_spark.operators.scd import ASOF_US, scd2_asof, scd2_history
from data_model_spark.sources.tables import load_table


def test_kanon_flags_exactly_the_small_groups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = k_anonymity_violations(docs).toPandas()
    assert (out.group_n < K).all()
    # cross-check against a direct pandas groupby
    pdf = docs.select(
        "lang", "source", F.expr("n_chars div 256").alias("len_bucket")
    ).toPandas()
    sizes = pdf.value_counts()
    want = {tuple(k): v for k, v in sizes.items() if v < K}
    got = {
        (r.lang, r.source, r.len_bucket): r.group_n
        for r in out.itertuples(index=False)
    }
    assert got == want and len(got) > 0


def test_asof_is_one_active_row_per_then_known_user(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    hist = scd2_history(ev)
    out = scd2_asof(hist).toPandas()
    # exactly one interval per user whose history starts before T
    started = (
        hist.groupBy("user_id")
        .agg(F.min("valid_from_us").alias("first"))
        .filter(F.col("first") <= ASOF_US)
        .count()
    )
    assert len(out) == started == out.user_id.nunique() > 0
    assert (out.valid_from_us <= ASOF_US).all()
    assert out.valid_to_us.isna().all() or (
        out.valid_to_us.fillna(ASOF_US + 1) > ASOF_US
    ).all()
