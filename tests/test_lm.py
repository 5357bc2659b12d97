"""Bigram-LM perplexity vs a pure-Python reference + filtering semantics."""

import math
from collections import Counter

from data_model_spark.operators import lm


def _ref(docs: dict[int, str], train: dict[int, str] | None = None):
    train = train if train is not None else docs

    def bigrams(text):
        ws = text.strip().lower().split()
        return [(f"{ws[i]} {ws[i+1]}", ws[i]) for i in range(len(ws) - 1)]

    c2, c1 = Counter(), Counter()
    vocab = set()
    for t in train.values():
        for b, w1 in bigrams(t):
            c2[b] += 1
            c1[w1] += 1
        vocab.update(w for w in t.strip().lower().split() if w)
    v = len(vocab)
    out = {}
    for did, t in docs.items():
        bgs = bigrams(t)
        if not bgs:
            continue
        nll = -sum(
            int(round(math.log((c2[b] + 1.0) / (c1[w1] + v)) * 1e9))
            for b, w1 in bgs
        )
        out[did] = (len(bgs), nll, round(math.exp(nll / 1e9 / len(bgs)), 6))
    return out


def _docs_df(spark, docs: dict[int, str]):
    return spark.createDataFrame(
        [(k, t) for k, t in docs.items()], "doc_id long, text string"
    )


DOCS = {
    1: "the cat sat on the mat",
    2: "the cat sat on the mat",  # exact dup -> identical score
    3: "the dog sat on the mat",
    4: "zyx wvu tsr qpo nml kji",  # all-rare bigrams
    5: "the cat the cat the cat the cat",
    6: "single",  # no bigram -> excluded
}


def test_matches_python_reference(spark):
    got = {
        r.doc_id: (r.n_bigrams, r.nll_nano, r.ppl)
        for r in lm.perplexity(_docs_df(spark, DOCS)).collect()
    }
    assert got == _ref(DOCS)
    assert 6 not in got


def test_filtering_semantics(spark):
    rows = {r.doc_id: r.ppl for r in lm.perplexity(_docs_df(spark, DOCS)).collect()}
    assert rows[1] == rows[2]  # duplicates score identically
    assert rows[4] > rows[1]  # rare-bigram doc is higher perplexity
    assert rows[5] < rows[4]  # repeated frequent bigram scores low


def test_external_model_backoff(spark):
    """Scoring held-out docs with unseen bigrams/prefixes backs off cleanly."""
    train = {i: t for i, t in DOCS.items() if i <= 3}
    score = {10: "the cat sat on unseen token", 11: "entirely novel words here"}
    model = lm.bigram_model(_docs_df(spark, train))
    got = {
        r.doc_id: (r.n_bigrams, r.nll_nano, r.ppl)
        for r in lm.perplexity(_docs_df(spark, score), model=model).collect()
    }
    assert got == _ref(score, train=train)
    # novel-everything doc must be strictly worse than the in-domain one
    assert got[11][2] > got[10][2]


class TestBM25:
    def test_hand_computed(self, spark):
        import math

        rows = [
            (0, "cat sat on the mat"),
            (1, "the dog sat"),
            (2, "cat cat dog"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        from data_model_spark.operators.text import bm25_scores

        got = {
            (r.doc_id, r.term): r.bm25 for r in bm25_scores(docs).collect()
        }
        n, avgdl = 3, (5 + 3 + 3) / 3
        def score(tf, df, dl, k1=1.2, b=0.75):
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)

        assert got[(0, "cat")] == score(1, 2, 5)
        assert got[(2, "cat")] == score(2, 2, 3)
        assert got[(1, "the")] == score(1, 2, 3)
        assert got[(2, "dog")] == score(1, 2, 3)
        assert len(got) == 5 + 3 + 2  # distinct terms per doc

    def test_rarer_term_scores_higher(self, spark):
        rows = [(i, "common filler words here") for i in range(9)]
        rows.append((9, "common rareword words here"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        from data_model_spark.operators.text import bm25_scores

        got = {(r.doc_id, r.term): r.bm25 for r in bm25_scores(docs).collect()}
        assert got[(9, "rareword")] > got[(9, "common")]


class TestPMI:
    def test_hand_computed(self, spark):
        import math

        from data_model_spark.operators.lm import pmi_collocations

        rows = [(i, "alpha beta alpha beta gamma") for i in range(5)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.w1, r.w2): (r.c_xy, r.pmi) for r in pmi_collocations(docs).collect()}
        # per doc: bigrams (alpha,beta)x2, (beta,alpha)x1, (beta,gamma)x1
        n, m = 25, 20
        c = {"alpha": 10, "beta": 10, "gamma": 5}
        def pmi(cxy, cx, cy):
            return round(math.log((cxy * n * n) / (m * c[cx] * c[cy])), 6)

        assert got[("alpha", "beta")] == (10, pmi(10, "alpha", "beta"))
        assert got[("beta", "alpha")] == (5, pmi(5, "beta", "alpha"))
        assert got[("beta", "gamma")] == (5, pmi(5, "beta", "gamma"))
        assert len(got) == 3

    def test_collocation_ranks_above_chance_pair(self, spark):
        from data_model_spark.operators.lm import pmi_collocations

        # "new york" always adjacent; "the of" co-occur only by chance
        text = "new york " + "the a of b " * 3
        docs = spark.createDataFrame(
            [(i, text + ("the of " if i % 2 else "of the ")) for i in range(10)],
            "doc_id long, text string",
        )
        got = {(r.w1, r.w2): r.pmi for r in pmi_collocations(docs).collect()}
        assert got[("new", "york")] > got[("the", "a")]


class TestCharEntropy:
    def test_hand_computed(self, spark):
        import math

        from data_model_spark.operators.text import char_entropy

        docs = spark.createDataFrame(
            [(0, "aaaa"), (1, "abab"), (2, "abcd")], "doc_id long, text string"
        )
        got = {r.doc_id: (r.n_chars_e, r.entropy_nanonats)
               for r in char_entropy(docs).collect()}
        def ent(probs):
            return sum(round(-p * math.log(p) * 1e9) for p in probs)
        assert got[0] == (4, 0)                      # single symbol
        assert got[1] == (4, ent([0.5, 0.5]))        # ln 2
        assert got[2] == (4, ent([0.25] * 4))        # ln 4
        assert got[2][1] > got[1][1] > got[0][1]

    def test_parallelism_independent(self, spark):
        from data_model_spark.operators.text import char_entropy

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = {tuple(r) for r in char_entropy(docs.coalesce(1)).collect()}
        b = {tuple(r) for r in char_entropy(docs.repartition(32)).collect()}
        assert a == b  # exact integer nanonats — bit-identical
