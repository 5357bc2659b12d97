"""Exact-integer k-means IVF: Spark vs a NumPy reference of the same
integer semantics (quantize -> rational centroids -> exact scaled distance)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators import ivf_kmeans as ik


def ref_assign(xq, cents):
    """cents: list of (cent_id, s(np int64 vec), n). Returns cell per row."""
    out = []
    for x in xq:
        best = None
        for cid, s, n in cents:
            num = int((s.astype(np.int64) ** 2).sum()) - 2 * int(n) * int(
                (x.astype(np.int64) * s.astype(np.int64)).sum()
            )
            key = (float(num) / float(n * n), cid)
            if best is None or key < best[0]:
                best = (key, cid)
        out.append(best[1])
    return np.array(out)


def ref_kmeans(ids, xq, k, iters):
    order = np.argsort(ids)
    cents = [
        (i, xq[order[i]].astype(np.int64).copy(), 1) for i in range(k)
    ]
    for _ in range(iters):
        cells = ref_assign(xq, cents)
        new = []
        for cid, s, n in cents:
            mask = cells == cid
            if mask.any():
                new.append((cid, xq[mask].sum(axis=0), int(mask.sum())))
            else:
                new.append((cid, s, n))
        cents = new
    return cents


def make_df(spark, ids, emb):
    rows = [(int(i), [float(v) for v in e]) for i, e in zip(ids, emb)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def quantize_np(emb):
    return np.floor(np.asarray(emb, dtype=np.float64) * 1024.0 + 0.5).astype(
        np.int64
    )


@pytest.mark.parametrize("seed", [0, 3])
def test_training_matches_numpy_reference(spark, seed):
    rng = np.random.default_rng(seed)
    emb = rng.normal(0, 0.5, size=(60, 4)).astype(np.float32)
    ids = np.arange(60)
    df = ik.quantize(make_df(spark, ids, emb), dim=4)
    got = ik.kmeans_train(df, k=3, iters=3, dim=4)
    want = ref_kmeans(ids, quantize_np(emb), k=3, iters=3)
    for (gc, gs, gn), (wc, ws, wn) in zip(got, want):
        assert gc == wc and gn == wn and list(gs) == list(ws)


def test_full_assign_matches_reference(spark):
    rng = np.random.default_rng(11)
    emb = rng.normal(0, 0.5, size=(80, 4)).astype(np.float32)
    ids = np.arange(80)
    df = make_df(spark, ids, emb)
    out = ik.ivf_kmeans_assign(df, sample_max_id=40, k=3, iters=2, dim=4)
    got = {r["vec_id"]: r["cell"] for r in out.collect()}
    xq = quantize_np(emb)
    cents = ref_kmeans(ids[:40], xq[:40], k=3, iters=2)
    want = ref_assign(xq, [(c, s, n) for c, s, n in cents])
    assert got == {int(i): int(w) for i, w in zip(ids, want)}


def test_emptied_cell_keeps_previous_centroid(spark):
    # ids 0 and 1 share a vector: in the FIRST assignment every point that
    # ties between centroids 0 and 1 goes to the lower cent_id, so cell 1
    # empties and must keep its init (s, n=1).  (Later iterations can pull
    # points back — c0's mean moves off the shared vector while c1 stays
    # exactly on it — so the guarantee is specifically iters=1.)
    emb = np.array(
        [[0.1, 0.1], [0.1, 0.1], [-0.4, -0.4], [-0.41, -0.39], [0.11, 0.1]],
        dtype=np.float32,
    )
    ids = np.arange(5)
    df = ik.quantize(make_df(spark, ids, emb), dim=2)
    got = ik.kmeans_train(df, k=3, iters=1, dim=2)
    want = ref_kmeans(ids, quantize_np(emb), k=3, iters=1)
    assert [(c, list(s), n) for c, s, n in got] == [
        (c, list(s), n) for c, s, n in want
    ]
    # the emptied centroid is still the quantized init vector with n=1
    assert got[1][2] == 1 and list(got[1][1]) == [102, 102]


def test_quantization_is_floor_half_up(spark):
    df = make_df(spark, [0], [[0.5 / 1024.0, -0.5 / 1024.0, 0.0, 1.5 / 1024.0]])
    row = ik.quantize(df, dim=4).select("xq").collect()[0]
    assert list(row["xq"]) == [1, 0, 0, 2]
