"""Edit-distance-1 join tests: brute-force completeness over random
typo corpora (all four edit kinds), false-positive refinement (shared
deletion at different positions = distance 2), duplicate strings,
unicode-free slicing sanity, and parallelism determinism."""

import itertools

import numpy as np

from data_model_spark.operators.fuzzy import editdist1_join


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _df(spark, strings):
    return spark.createDataFrame(
        list(enumerate(strings)), "id long, s string"
    )


def _brute(strings):
    return {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(strings), 2)
        if _lev(a, b) <= 1
    }


def test_matches_bruteforce_typo_corpus(spark):
    rng = np.random.default_rng(10)
    base = ["".join(rng.choice(list("abcd"), 6)) for _ in range(30)]
    corpus = list(base)
    for s in base[:15]:  # inject every edit kind
        i = int(rng.integers(0, len(s)))
        corpus.append(s[:i] + "x" + s[i + 1 :])   # substitution
        corpus.append(s[:i] + s[i + 1 :])          # deletion
        corpus.append(s[:i] + "y" + s[i:])         # insertion
        corpus.append(s)                            # exact duplicate
    got = {
        (r.id_a, r.id_b): r.dist
        for r in editdist1_join(_df(spark, corpus), "id", "s").collect()
    }
    assert got == _brute(corpus)
    assert len(got) >= 60  # the injections alone guarantee plenty


def test_shared_deletion_different_positions_rejected(spark):
    # "ab" and "ba" both have deletion key "a" and "b" but distance 2
    got = editdist1_join(_df(spark, ["ab", "ba"]), "id", "s").collect()
    assert got == []


def test_duplicates_found_once_with_dist_zero(spark):
    rows = editdist1_join(_df(spark, ["same", "same"]), "id", "s").collect()
    assert len(rows) == 1 and rows[0].dist == 0


def test_single_char_and_empty_adjacent(spark):
    got = {
        (r.id_a, r.id_b): r.dist
        for r in editdist1_join(_df(spark, ["", "a", "b"]), "id", "s").collect()
    }
    # ""~"a" (1), ""~"b" (1), "a"~"b" (1 substitution)
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 1}


def test_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(5)
    corpus = ["".join(rng.choice(list("abc"), 5)) for _ in range(60)]
    df = _df(spark, corpus)
    a = sorted(map(tuple, editdist1_join(df.repartition(1), "id", "s").collect()))
    b = sorted(map(tuple, editdist1_join(df.repartition(16), "id", "s").collect()))
    assert a == b and len(a) > 10
