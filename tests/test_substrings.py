"""Duplicate-span detection tests: hand-built goldens with overlapping /
nested / disjoint intervals, a pure-Python reference on the real corpus,
within-doc repeats, and parallelism determinism."""

import hashlib
import re
from collections import Counter

from data_model_spark.operators.substrings import dup_span_stats
from data_model_spark.sources.tables import load_table


def _ref(rows, n, min_count=2):
    occ = []  # (doc_id, start 1-based, gram)
    lens = {}
    for doc_id, text in rows:
        ws = re.split(" +", text.strip().lower())
        lens[doc_id] = len(ws)
        for i in range(len(ws) - n + 1):
            occ.append((doc_id, i + 1, " ".join(ws[i : i + n])))
    cnt = Counter(g for _, _, g in occ)
    spans = {}
    for doc_id, s, g in occ:
        if cnt[g] >= min_count:
            spans.setdefault(doc_id, []).append((s, s + n - 1))
    out = {}
    for doc_id, L in lens.items():
        covered = set()
        for s, e in spans.get(doc_id, []):
            covered.update(range(s, e + 1))
        out[doc_id] = (L, len(covered))
    return out


def test_hand_golden_overlap_merge(spark):
    # doc 1+2 share the 3-gram "a b c" twice each at overlapping positions;
    # doc 3 is unique text -> 0 dup tokens.
    rows = [
        (1, "a b c d a b c x y"),   # grams at s=1 and s=5 both dup
        (2, "z a b c d q a b c d"), # "a b c" dup; "b c d" dup; "a b c d" windows
        (3, "unique words only here nothing repeats"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.dup_tokens) for r in dup_span_stats(docs, n=3).collect()}
    assert got == _ref(rows, n=3)
    assert got[3][1] == 0
    assert got[1][1] > 0 and got[2][1] > 0


def test_within_doc_repeat_counts(spark):
    # the duplicated n-gram occurs twice INSIDE one doc: both intervals count
    rows = [(1, "p q r s t p q r s t")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = dup_span_stats(docs, n=5).collect()[0]
    # grams "p q r s t" at s=1 and s=6 -> union [1,5] U [6,10] = 10 tokens
    assert (got.n_tokens, got.dup_tokens) == (10, 10)


def test_short_doc_reports_zero(spark):
    docs = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    got = dup_span_stats(docs, n=5).collect()[0]
    assert (got.n_tokens, got.dup_tokens) == (2, 0)


def test_matches_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    want = _ref(rows, n=10)
    got = {r.doc_id: (r.n_tokens, r.dup_tokens) for r in dup_span_stats(docs).collect()}
    assert got == want
    assert sum(1 for _, d in got.values() if d > 0) >= 5  # non-vacuous


def test_deterministic_across_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, dup_span_stats(docs.repartition(1)).collect()))
    b = sorted(map(tuple, dup_span_stats(docs.repartition(11)).collect()))
    assert a == b
