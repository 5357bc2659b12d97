"""Curriculum buckets: coverage, sizes, monotone quality schedule."""

from data_model_spark.operators.curriculum import N_BUCKETS, curriculum_buckets
from data_model_spark.sources.tables import load_table


def test_buckets_partition_corpus_with_monotone_quality(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curriculum_buckets(docs).orderBy("bucket").toPandas()
    assert list(out.bucket) == list(range(1, N_BUCKETS + 1))
    assert out.n_docs.sum() == docs.count()
    # NTILE size contract: first n % k buckets one larger
    n = out.n_docs.sum()
    base, extra = divmod(n, N_BUCKETS)
    assert list(out.n_docs) == [base + (1 if i < extra else 0) for i in range(N_BUCKETS)]
    # the schedule is monotone: bucket b's worst >= bucket b+1's best
    for i in range(len(out) - 1):
        assert out.worst[i] >= out.best[i + 1]
