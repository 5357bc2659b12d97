"""Corpus profiling: NumPy quantile golden + vocabulary determinism."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators import profile as prof
from data_model_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_length_profile_matches_numpy_interpolation(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        r["lang"]: r for r in prof.length_profile(docs).collect()
    }
    pdf = docs.select("lang", "n_chars").toPandas()
    for lang, grp in pdf.groupby("lang"):
        x = np.sort(grp["n_chars"].to_numpy())
        want_p50, want_p90, want_p99 = (
            np.quantile(x, q, method="linear") for q in (0.5, 0.9, 0.99)
        )
        r = got[lang]
        assert r["n_docs"] == len(x)
        assert abs(r["mean_chars"] - round(float(x.mean()), 6)) < 1e-6
        assert abs(r["p50"] - round(float(want_p50), 6)) < 1e-6
        assert abs(r["p90"] - round(float(want_p90), 6)) < 1e-6
        assert abs(r["p99"] - round(float(want_p99), 6)) < 1e-6


def test_vocab_topk_deterministic_under_repartition(spark):
    docs = load_table(spark, SF, "documents")
    a = sorted(map(tuple, prof.vocab_topk(docs, k=5).collect()))
    b = sorted(map(tuple, prof.vocab_topk(docs.repartition(17), k=5).collect()))
    assert a == b and len(a) > 0


def test_vocab_topk_is_document_frequency(spark):
    df = spark.createDataFrame(
        [(0, "en", "a a a b"), (1, "en", "b c"), (2, "en", "b")],
        "doc_id long, lang string, text string",
    )
    got = {(r["token"]): (r["df"], r["rk"]) for r in prof.vocab_topk(df, k=3).collect()}
    # 'a' appears 3x in one doc but df counts DOCUMENTS: a=1, b=3, c=1
    assert got["b"] == (3, 1)
    assert got["a"] == (1, 2)  # tie with c broken lexicographically
    assert got["c"] == (1, 3)
