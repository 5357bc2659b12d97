"""Dataset card: figures consistent with the dedicated operators."""

from data_model_spark.operators.dataset_card import dataset_card
from data_model_spark.sources.tables import load_table


def test_card_consistent_with_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    card = dataset_card(docs).collect()[0]
    n = docs.count()
    assert card.n_docs == n
    assert card.n_langs == docs.select("lang").distinct().count()
    assert card.n_sources == docs.select("source").distinct().count()
    # the synthetic corpus has no byte-identical rows
    assert card.n_exact_dups == 0
    # PII augmentation residues: doc_id % 3/5/7 -> inclusion-exclusion lower
    # bound: at least the %3 docs are flagged
    assert card.n_pii_docs >= n // 3
    assert abs(card.pii_rate - round(card.n_pii_docs / n, 6)) < 1e-9
    assert card.n_tokens > 0 and card.min_chars <= card.max_chars
