"""DSIR importance-weight tests: pure-Python reference equality on the real
corpus, determinism across parallelism, directionality on a hand-built
corpus, and the broadcast plan shape."""

import hashlib
import math
import re
from collections import Counter

from pyspark.sql import functions as F

from data_model_spark.operators.dsir import dsir_weights
from data_model_spark.sources.tables import load_table


def _ref_dsir(rows, target_langs=("en",), n_buckets=1024):
    """(doc_id -> (n_bigrams, dsir_nanonats)) reference implementation."""
    occ = []
    for doc_id, text, lang in rows:
        ws = re.split(" +", text.strip().lower())
        if len(ws) < 2:
            continue
        tgt = lang in target_langs
        for i in range(len(ws) - 1):
            bg = ws[i] + " " + ws[i + 1]
            b = int(hashlib.md5(bg.encode()).hexdigest()[:15], 16) % n_buckets
            occ.append((doc_id, tgt, b))
    c_raw = Counter(b for _, _, b in occ)
    c_tgt = Counter(b for _, t, b in occ if t)
    t_raw = sum(c_raw.values())
    t_tgt = sum(c_tgt.values())
    lam = {
        b: int(
            round(
                (
                    math.log((c_tgt.get(b, 0) + 1.0) / (t_tgt + float(n_buckets)))
                    - math.log((c_raw[b] + 1.0) / (t_raw + float(n_buckets)))
                )
                * 1e9
            )
        )
        for b in c_raw
    }
    out = {}
    for doc_id, _, b in occ:
        n, s = out.get(doc_id, (0, 0))
        out[doc_id] = (n + 1, s + lam[b])
    return out


def test_matches_reference_on_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = [(r.doc_id, r.text, r.lang) for r in docs.select("doc_id", "text", "lang").collect()]
    want = _ref_dsir(rows)
    got = {
        r.doc_id: (r.n_bigrams, r.dsir_nanonats)
        for r in dsir_weights(docs).collect()
    }
    assert got == want
    assert len(got) >= 100  # non-vacuous


def test_deterministic_across_parallelism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, dsir_weights(docs.repartition(1)).collect()))
    b = sorted(map(tuple, dsir_weights(docs.repartition(13)).collect()))
    assert a == b


def test_target_docs_score_higher(spark):
    # target docs share a vocabulary; raw noise docs use a disjoint one —
    # every target-doc bucket is target-heavy, so target scores must exceed
    # every noise score.
    rows = []
    for i in range(10):
        rows.append((i, f"good tokens flow good tokens flow {i % 3}", "en"))
    for i in range(10, 20):
        rows.append((i, f"junk spam noise junk spam noise {i % 3}", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r.dsir_nanonats for r in dsir_weights(docs).collect()}
    assert min(got[i] for i in range(10)) > max(got[i] for i in range(10, 20))


def test_bucket_join_is_broadcast(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = dsir_weights(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_empty_and_single_token_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "only", "en"), (2, "", "en"), (3, "two tokens", "en")],
        "doc_id long, text string, lang string",
    )
    got = dsir_weights(docs).collect()
    assert [r.doc_id for r in got] == [3]
    assert got[0].n_bigrams == 1
