"""Dedup + similarity suites: LSH recall vs exact, simhash sanity, ANN recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import dedup, similarity
from data_model_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    d = load_table(spark, SF, "documents").filter(F.col("doc_id") < 150)
    d.cache().count()
    return d


@pytest.fixture(scope="module")
def emb(spark):
    e = load_table(spark, SF, "embeddings")
    e.cache().count()
    return e


class TestDedup:
    def test_exact_pairs_nonempty(self, docs):
        pairs = dedup.jaccard_pairs(docs, 0.5).collect()
        assert len(pairs) > 0  # synthetic corpus contains near-dups
        assert all(r.doc_a < r.doc_b and r.jaccard >= 0.5 for r in pairs)

    def test_salted_shingle_join_equals_unsalted(self, spark):
        """Hot-key skew fixture: one boilerplate shingle in 50% of docs.
        The default (salted) path must return exactly the unsalted output."""
        rng = np.random.default_rng(7)
        rows = []
        for i in range(80):
            words = [f"w{rng.integers(0, 40)}" for _ in range(12)]
            if i % 2 == 0:  # hot 3-gram "hot hot hot" in half the corpus
                words[3:3] = ["hot", "hot", "hot"]
            rows.append((i, " ".join(words)))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # hot_min=10 makes the fixture's hot shingle take the salted path
        salted = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.jaccard_pairs(docs, 0.1, salt=5, hot_min=10).collect()
        }
        unsalted = {
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.jaccard_pairs(docs, 0.1, salt=0).collect()
        }
        assert salted == unsalted and len(unsalted) > 0

    def test_self_pairs_hot_path_covers_hot_keys(self, spark):
        """self_pairs with hot_min=2: every key is hot; pairs still exact."""
        df = spark.createDataFrame(
            [(i, "k%d" % (i % 3)) for i in range(12)], "doc_id long, shingle string"
        )
        got = {
            (r.doc_a, r.doc_b)
            for r in dedup.self_pairs(df, ["shingle"], salt=4, hot_min=2).collect()
        }
        exp = {
            (a, b)
            for a in range(12)
            for b in range(12)
            if a < b and a % 3 == b % 3
        }
        assert got == exp

    def test_minhash_lsh_full_recall_at_high_threshold(self, docs):
        # 64 hashes / 16 bands of 4: P(miss | j>=0.7) < 1e-6 -> exact match
        exact = {
            (r.doc_a, r.doc_b)
            for r in dedup.jaccard_pairs(docs, 0.7).collect()
        }
        lsh = {
            (r.doc_a, r.doc_b)
            for r in dedup.minhash_lsh_dedup(docs, threshold=0.7).collect()
        }
        assert exact, "expected near-dups at 0.7 in the synthetic corpus"
        assert lsh == exact

    def test_lsh_candidates_are_pruning(self, docs):
        sh = dedup.shingles_df(docs)
        sig = dedup.minhash_signatures(sh)
        cand = dedup.lsh_candidates(sig).count()
        n_docs = docs.count()
        all_pairs = n_docs * (n_docs - 1) // 2
        assert cand < all_pairs * 0.5  # bucketing prunes the pair space

    def test_simhash_near_pairs_overlap_jaccard(self, docs):
        sim = {
            (r.doc_a, r.doc_b)
            for r in dedup.simhash_near_pairs(docs, max_hamming=16).collect()
        }
        exact = {
            (r.doc_a, r.doc_b)
            for r in dedup.jaccard_pairs(docs, 0.8).collect()
        }
        # very similar docs must collide in at least one 16-bit chunk
        assert exact.issubset(sim) or len(exact - sim) <= max(1, len(exact) // 5)

    def test_simhash_deterministic(self, docs):
        a = dedup.simhash_df(docs).orderBy("doc_id").collect()
        b = dedup.simhash_df(docs).orderBy("doc_id").collect()
        assert a == b


class TestSimilarity:
    def test_bruteforce_topk_matches_numpy(self, emb):
        got = similarity.brute_force_topk(
            emb.filter("vec_id >= 3"), emb.filter("vec_id < 3"), k=5
        ).collect()
        pdf = emb.toPandas()
        mat = np.array([np.asarray(v) for v in pdf["embedding"]], dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        norms = np.linalg.norm(mat, axis=1)
        for q in range(3):
            qi = np.where(ids == q)[0][0]
            sims = mat @ mat[qi] / (norms * norms[qi])
            cand = [(round(s, 6), int(i)) for s, i in zip(sims, ids) if i >= 3]
            cand.sort(key=lambda t: (-t[0], t[1]))
            expected = [i for _, i in cand[:5]]
            got_q = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == q]
            assert got_q == expected

    def test_lsh_topk_recall(self, emb):
        brute = similarity.brute_force_topk(
            emb.filter("vec_id >= 3"), emb.filter("vec_id < 3"), k=5
        ).collect()
        lsh = similarity.lsh_topk(
            emb.filter("vec_id >= 3"), emb.filter("vec_id < 3"), k=5, num_planes=6
        ).collect()
        bset = {(r.query_id, r.vec_id) for r in brute}
        lset = {(r.query_id, r.vec_id) for r in lsh}
        # 6 planes -> 64 buckets over ~500 vectors: same-bucket recall is
        # partial by design; assert the scale path returns sane, refined hits
        assert len(lset & bset) >= 1
        assert all(r.cosine <= 1.0 + 1e-9 for r in lsh)

    def test_multitable_lsh_neardup_recall(self, emb):
        """Multi-table OR-construction: 6 tables x 3 planes must recover a
        large fraction of the exact >= 0.35 cosine pairs — the single
        6-plane table it replaced pruned the sf0.01 fixture to ZERO pairs
        (the vacuous-oracle finding in VERDICT r3)."""
        sub = emb.filter("vec_id < 200")
        pdf = sub.toPandas()
        mat = np.array([np.asarray(v) for v in pdf["embedding"]], dtype=np.float64)
        ids = pdf["vec_id"].to_numpy()
        n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        cos = n @ n.T
        exact = {
            (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if round(cos[i, j], 6) >= 0.35
        }
        got = {
            (r.vec_a, r.vec_b)
            for r in similarity.emb_neardup_lsh(
                sub, threshold=0.35, num_tables=6, num_planes=3
            ).collect()
        }
        assert got.issubset(exact)  # refinement admits no false positives
        if exact:
            assert len(got) / len(exact) >= 0.5  # OR-construction recall

    def test_ivf_assignment_partitions_all(self, emb):
        cells_df = similarity.ivf_assign(emb, num_cells=8)
        counts = dict(
            (r.ivf_cell, r.n)
            for r in cells_df.groupBy("ivf_cell").agg(F.count("*").alias("n")).collect()
        )
        assert sum(counts.values()) == emb.count()
        assert all(0 <= c < 8 for c in counts)


class TestCacheHygiene:
    def test_unpersist_intermediates_releases_caches(self, spark, docs):
        dedup.jaccard_pairs(docs, 0.5).count()
        assert dedup.unpersist_intermediates() > 0
        assert dedup.unpersist_intermediates() == 0  # idempotent


def test_band_hashes_match_signature_path(spark, sf_dir):
    from data_model_spark.operators import dedup
    from data_model_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.shingles_df(docs, 3)
    via_sig = (
        dedup.minhash_signatures(sh)
        .withColumn("band", F.col("hash_id") % 16)
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("hash_id", "minhash"))
                        ),
                        lambda s: s["minhash"].cast("string"),
                    ),
                )
            ).alias("bh")
        )
    )
    direct = dedup.minhash_band_hashes(sh)
    a = sorted(map(tuple, via_sig.collect()))
    b = sorted(map(tuple, direct.select("doc_id", "band", "bh").collect()))
    assert a == b and len(a) > 0
