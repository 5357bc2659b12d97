"""Gramian: exact-integer equality with direct NumPy + PCA usability."""

import numpy as np

from data_model_spark.operators.gramian import DIM, Q_SCALE, emb_gramian
from data_model_spark.sources.tables import load_table


def _dense(rows, dim=DIM):
    G = np.zeros((dim, dim), np.int64)
    for r in rows:
        G[r.i - 1, r.j - 1] = r.g
        G[r.j - 1, r.i - 1] = r.g
    return G


def test_gramian_equals_direct_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb_gramian(emb).collect()
    assert len(rows) == DIM * (DIM + 1) // 2
    G = _dense(rows)
    E = np.stack([r.embedding for r in emb.collect()]).astype(np.float64)
    Q = np.floor(E * Q_SCALE + 0.5).astype(np.int64)
    assert np.array_equal(G, Q.T @ Q)


def test_gramian_parallelism_invariant_and_pca_usable(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, emb_gramian(emb.repartition(1)).collect()))
    b = sorted(map(tuple, emb_gramian(emb.repartition(13)).collect()))
    assert a == b  # exact integers: no accumulation-order dependence
    G = _dense([type("R", (), dict(i=i, j=j, g=g))() for i, j, g in a])
    # PSD second moment: eigh gives nonnegative spectrum usable for PCA
    w = np.linalg.eigvalsh(G.astype(np.float64))
    assert w.min() > -1e-6 * w.max()
    assert w.max() > 0
