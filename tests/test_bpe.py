"""BPE training tests: pure-Python Sennrich reference equality on the real
corpus, hand goldens (overlap + end-marker), and parallelism determinism.
The sequential reference lives in the operator module (``ref_bpe``) so the
``bpe_train_fp`` oracle replays through the same kernel."""

from data_model_spark.operators.bpe import bpe_train, ref_bpe as _ref_bpe
from data_model_spark.sources.tables import load_table


def test_matches_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    want = _ref_bpe(texts, 20)
    got = bpe_train(docs, n_merges=20)
    assert got == want
    assert len(got) == 20


def test_hand_golden_overlap_and_marker(spark):
    # "aaab" x3: first merge is (a,a) count 6 (leftmost-first: 'aaa' gives
    # 2 pairs per word... actually [a,a,a,b,</w>]: pairs (a,a)x2 -> merged
    # leftmost-first to [aa,a,b,</w>])
    docs = spark.createDataFrame([(i, "aaab aaab") for i in range(3)],
                                 "doc_id long, text string")
    got = bpe_train(docs, n_merges=3)
    want = _ref_bpe(["aaab aaab"] * 3, 3)
    assert got == want
    assert got[0][0] == "a" and got[0][1] == "a"


def test_end_marker_distinguishes_final_position(spark):
    # 'ab' and 'aab': the b</w> merge competes with (a,b); reference decides
    docs = spark.createDataFrame([(1, "ab ab ab aab aab")], "doc_id long, text string")
    assert bpe_train(docs, n_merges=4) == _ref_bpe(["ab ab ab aab aab"], 4)


def test_deterministic_across_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = bpe_train(docs.repartition(1), n_merges=8)
    b = bpe_train(docs.repartition(13), n_merges=8)
    assert a == b


def test_encode_matches_reference_and_reconstructs(spark):
    from data_model_spark.operators.bpe import (
        END,
        _fixture_texts,
        bpe_encode_words,
        bpe_train,
        ref_encode,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_fixture_texts())], "doc_id long, text string"
    )
    merges = bpe_train(docs, n_merges=16)
    words = sorted({w for t in _fixture_texts() for w in t.split()})
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r.w: list(r.tokens) for r in bpe_encode_words(wdf, merges).collect()
    }
    for w in words:
        assert got[w] == ref_encode(w, merges), w
        # tokens reconstruct the word exactly (losslessness)
        assert "".join(got[w]) == w + END
    # non-vacuous: multi-char tokens actually appear
    assert any(len(t) > 1 for toks in got.values() for t in toks)
