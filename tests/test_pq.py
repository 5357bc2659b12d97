"""PQ tests: pure-Python snapped-Lloyd reference equality, codebook health
(no collapse), ADC recall floor vs exact neighbors, ADC exactness from
codes+codebooks, and parallelism determinism."""

import numpy as np

from data_model_spark.operators.ivf_kmeans import quantize
from data_model_spark.operators.pq import (
    M_SUB,
    SUB_DIM,
    adc_topk,
    pq_codes,
)
from data_model_spark.sources.tables import load_table


def _ref_pq(X: dict[int, np.ndarray], sample_max_id=256, m=4, sub_dim=16, k=8, iters=2):
    """Reference snapped-Lloyd PQ: (codes {vid: tuple}, books [per-subspace
    centroid arrays])."""
    ids = sorted(X)
    books = []
    for j in range(m):
        sl = slice(j * sub_dim, (j + 1) * sub_dim)
        samp = [(v, X[v][sl]) for v in ids if v < sample_max_id]
        cents = [samp[i][1].astype(np.int64).copy() for i in range(k)]
        for _ in range(iters):
            groups = {c: [] for c in range(k)}
            for v, x in samp:
                d = [int(((x - c) ** 2).sum()) for c in cents]
                groups[min(range(k), key=lambda i: (d[i], i))].append(x)
            for c in range(k):
                if groups[c]:
                    s = np.sum(groups[c], axis=0, dtype=np.int64)
                    n = len(groups[c])
                    cents[c] = np.array([(2 * int(si) + n) // (2 * n) for si in s],
                                        dtype=np.int64)
        books.append(cents)
    codes = {}
    for v in ids:
        t = []
        for j in range(m):
            x = X[v][j * sub_dim : (j + 1) * sub_dim]
            d = [int(((x - c) ** 2).sum()) for c in books[j]]
            t.append(min(range(len(books[j])), key=lambda i: (d[i], i)))
        codes[v] = tuple(t)
    return codes, books


def _xq(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, {
        r.vec_id: np.array(r.xq, dtype=np.int64)
        for r in quantize(emb, M_SUB * SUB_DIM).select("vec_id", "xq").collect()
    }


def test_codes_match_reference(spark, sf_dir):
    emb, X = _xq(spark, sf_dir)
    want, _ = _ref_pq(X)
    got = {r.vec_id: (r.c0, r.c1, r.c2, r.c3) for r in pq_codes(emb).collect()}
    assert got == want


def test_codebooks_do_not_collapse(spark, sf_dir):
    emb, _ = _xq(spark, sf_dir)
    rows = pq_codes(emb).collect()
    for j in range(M_SUB):
        used = {getattr(r, f"c{j}") for r in rows}
        assert len(used) >= 4, f"subspace {j} collapsed to {len(used)} cells"


def test_adc_recall_beats_random(spark, sf_dir):
    emb, X = _xq(spark, sf_dir)
    q = X[7]
    exact = [v for _, v in sorted(
        (int(((X[v] - q) ** 2).sum()), v) for v in X if v != 7)[:10]]
    got = [r.vec_id for r in adc_topk(emb, 7, topk=10).collect()]
    # random recall@10 on |corpus| vectors is ~10/|corpus| (< 0.05);
    # require a real signal
    assert len(set(got) & set(exact)) >= 2


def test_adc_distances_exact_from_codes(spark, sf_dir):
    emb, X = _xq(spark, sf_dir)
    codes, books = _ref_pq(X)
    q = X[7]
    want = {}
    for v, t in codes.items():
        if v == 7:
            continue
        want[v] = sum(
            int(((q[j * SUB_DIM : (j + 1) * SUB_DIM] - books[j][t[j]]) ** 2).sum())
            for j in range(M_SUB)
        )
    top = adc_topk(emb, 7, topk=15).collect()
    for r in top:
        assert r.adc_d2 == want[r.vec_id]
    # and the top-15 really are the 15 smallest (ties on vec_id)
    expect = sorted(want.items(), key=lambda kv: (kv[1], kv[0]))[:15]
    assert [(r.vec_id, r.adc_d2) for r in top] == [(v, d) for v, d in expect]


def test_deterministic_across_parallelism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, pq_codes(emb.repartition(1)).collect()))
    b = sorted(map(tuple, pq_codes(emb.repartition(9)).collect()))
    assert a == b
