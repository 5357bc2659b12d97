"""Domain mixing weights: normalization + temperature-smoothing shape."""

import math

from data_model_spark.operators.mixing import domain_mix_weights
from data_model_spark.sources.tables import load_table


def test_weights_normalize_and_flatten(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = domain_mix_weights(docs).toPandas()
    assert len(out) == docs.select("source").distinct().count()
    assert abs(out.p_nat.sum() - 1.0) < 1e-5
    assert abs(out.w_mix.sum() - 1.0) < 1e-5
    # sqrt temperature flattens: the largest source is downweighted,
    # the smallest upsampled (epochs > 1), and ordering is preserved
    big = out.loc[out.n_docs.idxmax()]
    small = out.loc[out.n_docs.idxmin()]
    if big.n_docs > small.n_docs:
        assert big.w_mix < big.p_nat + 1e-9
        assert small.epochs >= 1.0
    ordered = out.sort_values("n_docs")
    assert ordered.w_mix.is_monotonic_increasing


def test_epochs_match_direct_formula(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = domain_mix_weights(docs).toPandas()
    n = out.n_docs.sum()
    qs = {
        r.source: math.floor(math.sqrt(r.n_docs / n) * 10**12 + 0.5)
        for r in out.itertuples()
    }
    denom = sum(qs.values())
    for r in out.itertuples():
        w = qs[r.source] / denom
        assert abs(r.w_mix - round(w, 6)) < 2e-6
        assert abs(r.epochs - round(w / (r.n_docs / n), 6)) < 2e-6
