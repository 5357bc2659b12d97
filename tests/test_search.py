"""Positional phrase search: Python-reference equality, overlaps, edges."""

import pytest
from pyspark.sql import functions as F

from data_model_spark.operators.search import build_postings, phrase_match


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _ref_hits(texts, phrase):
    terms = phrase.lower().split()
    out = {}
    for i, t in enumerate(texts):
        ws = t.strip().lower().split()
        n = sum(
            1
            for p in range(len(ws) - len(terms) + 1)
            if ws[p : p + len(terms)] == terms
        )
        if n:
            out[i] = n
    return out


def test_matches_python_reference(spark):
    texts = [
        "the quick brown fox",
        "quick brown quick brown fox",
        "brown quick",
        "the quick Brown fox says quick brown",
    ]
    df = _df(spark, texts)
    post = build_postings(df)
    for phrase in ("quick brown", "quick brown fox", "brown", "the quick brown fox"):
        got = {r.doc_id: r.n_hits for r in phrase_match(post, phrase).collect()}
        assert got == _ref_hits(texts, phrase), phrase


def test_overlapping_occurrences_counted(spark):
    # 'a a a a' contains 'a a' three times (overlaps allowed)
    df = _df(spark, ["a a a a"])
    got = phrase_match(build_postings(df), "a a").collect()
    assert [(r.doc_id, r.n_hits) for r in got] == [(0, 3)]


def test_repeated_term_phrase_requires_true_adjacency(spark):
    df = _df(spark, ["x y x", "x x y"])
    got = {r.doc_id: r.n_hits for r in phrase_match(build_postings(df), "x x").collect()}
    assert got == {1: 1}


def test_missing_term_and_empty_phrase(spark):
    df = _df(spark, ["hello world"])
    post = build_postings(df)
    assert phrase_match(post, "absent term").count() == 0
    with pytest.raises(ValueError, match="empty"):
        phrase_match(post, "   ")


def test_case_insensitive(spark):
    df = _df(spark, ["Foo BAR baz"])
    got = phrase_match(build_postings(df), "foo bar").collect()
    assert [(r.doc_id, r.n_hits) for r in got] == [(0, 1)]
