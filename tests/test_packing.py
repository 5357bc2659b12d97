"""Sequence packing (concat-and-chunk): stream invariants + determinism."""

from pyspark.sql import functions as F

from data_model_spark.operators.packing import CAPACITY, N_SHARDS, pack_sequences
from data_model_spark.sources.tables import load_table


def test_stream_is_gapless_and_straddlers_exist(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    p = pack_sequences(docs).toPandas()
    assert len(p) > 0
    # within each shard the placements tile the token stream exactly:
    # doc k starts where doc k-1 ended (start_seq*CAP + start_off is the
    # running cumsum), and every token lands in exactly one sequence
    for shard, g in p.sort_values(["shard", "doc_id"]).groupby("shard"):
        pos = 0
        for r in g.itertuples(index=False):
            assert r.start_seq * CAPACITY + r.start_off == pos, (shard, r.doc_id)
            pos += r.n_tok
            assert r.end_seq == (pos - 1) // CAPACITY
            assert r.n_seqs == r.end_seq - r.start_seq + 1
    # non-vacuous: some documents straddle a sequence boundary
    assert (p.n_seqs > 1).any()
    assert p.shard.nunique() == N_SHARDS


def test_deterministic_across_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, pack_sequences(docs.repartition(1)).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(17)).collect()))
    assert a == b


def test_single_shuffle_plan(spark, sf_dir):
    from data_model_spark.plans.bucketing import count_exchanges

    docs = load_table(spark, sf_dir, "documents")
    assert count_exchanges(pack_sequences(docs)) <= 1
