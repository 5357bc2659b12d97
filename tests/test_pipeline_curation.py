"""Composed curation pipeline: stage coupling + output invariants."""

from data_model_spark.operators.dedup import unpersist_intermediates
from data_model_spark.operators.packing import CAPACITY
from data_model_spark.operators.pipeline_curation import full_curation_pipeline
from data_model_spark.operators.sampling import _RATES, curation_flags
from data_model_spark.sources.tables import load_table


def test_pipeline_rows_are_kept_docs_with_valid_placements(spark):
    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    try:
        out = full_curation_pipeline(docs).toPandas()
        kept = {
            r.doc_id
            for r in curation_flags(docs, _RATES).filter("keep").collect()
        }
    finally:
        unpersist_intermediates()
    assert len(out) > 0
    assert set(out.doc_id) == kept  # exactly the surviving docs
    # placements tile gaplessly WITHIN the curated stream per shard
    for _, g in out.sort_values(["shard", "doc_id"]).groupby("shard"):
        pos = 0
        for r in g.itertuples(index=False):
            assert r.start_seq * CAPACITY <= pos < (r.start_seq + 1) * CAPACITY
            pos += r.n_tok
            assert r.end_seq == (pos - 1) // CAPACITY
    # PII provenance present and sane
    assert (out.n_pii >= 0).all() and out.red_fp.notna().all()
