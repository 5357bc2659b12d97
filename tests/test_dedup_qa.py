"""LSH candidate-stage PR stats: internal consistency + recall floor."""

from data_model_spark.operators.dedup import unpersist_intermediates
from data_model_spark.operators.dedup_qa import lsh_pr_stats
from data_model_spark.sources.tables import load_table


def test_pr_stats_consistent_and_recall_high(spark):
    # sf0.01 plants 25 near-dup pairs at jaccard >= 0.9; with 64 hashes /
    # 16 bands a 0.9-pair matches some band w.p. ~1-(1-0.9^4)^16 ≈ 0.9999
    docs = load_table(spark, "/root/testdata/sf0.01", "documents").filter(
        "doc_id < 500"
    )
    try:
        row = lsh_pr_stats(docs).collect()[0]
    finally:
        unpersist_intermediates()
    assert row.n_truth > 0 and row.n_cand > 0
    assert row.tp + row.fn == row.n_truth
    assert row.tp + row.fp == row.n_cand
    assert row.recall >= 0.9  # documented banding recall floor at j>=0.9
    assert 0.0 < row.precision <= 1.0
    assert abs(row.precision - round(row.tp / row.n_cand, 6)) < 1e-9
