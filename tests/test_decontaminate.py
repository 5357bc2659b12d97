"""Decontamination + repetition signals on crafted fixtures."""

from pyspark.sql import functions as F

from data_model_spark.operators.decontaminate import (
    decontaminate,
    repetition_stats,
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_ngram_overlap_flags(spark):
    ev = docs_df(spark, [(100, "the quick brown fox jumps over the dog")])
    train = docs_df(
        spark,
        [
            # contains the eval 5-gram "quick brown fox jumps over"
            (0, "he said quick brown fox jumps over and left"),
            # shares only a 4-gram ("brown fox jumps over" but never 5)
            (1, "lazy brown fox jumps over x"),
            (2, "completely unrelated text with no overlap at all"),
        ],
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate(train, ev, n=5).collect()
    }
    assert got == {0: True, 1: False, 2: False}


def test_repetition_stats_values(spark):
    df = docs_df(
        spark,
        [
            (0, "a b\na b\nc d"),     # 3 lines, one duplicated
            (1, "x y x y x y"),       # bigram "x y" occurs 3 of 5 bigrams
            (2, "solo"),              # no bigrams -> frac 0
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[0]["n_lines"] == 3
    assert abs(got[0]["dup_line_frac"] - 1 / 3) < 1e-6
    assert abs(got[1]["top_bigram_frac"] - 3 / 5) < 1e-6
    assert got[2]["top_bigram_frac"] == 0.0


def test_decontaminate_keeps_all_train_rows(spark):
    ev = docs_df(spark, [(10, "one two three four five")])
    train = docs_df(spark, [(i, f"doc {i} text body here now") for i in range(7)])
    out = decontaminate(train, ev, n=5)
    assert out.count() == 7
    assert out.filter(F.col("contaminated")).count() == 0
