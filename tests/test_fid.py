"""FID moments: exact integer equality with direct NumPy; Fréchet sanity."""

import numpy as np

from data_model_spark.operators.fid import fid_moments, frechet_from_moments
from data_model_spark.operators.gramian import DIM, Q_SCALE
from data_model_spark.sources.tables import load_table


def _direct(emb_rows):
    n = {0: 0, 1: 0}
    s = {k: np.zeros(DIM, np.int64) for k in (0, 1)}
    G = {k: np.zeros((DIM, DIM), np.int64) for k in (0, 1)}
    for r in emb_rows:
        k = int(r.vec_id % 2)
        q = np.floor(np.asarray(r.embedding, np.float64) * Q_SCALE + 0.5).astype(
            np.int64
        )
        n[k] += 1
        s[k] += q
        G[k] += np.outer(q, q)
    return n, s, G


def test_moments_equal_direct_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = fid_moments(emb).collect()
    n, s, G = _direct(emb.collect())
    got = {(r.slc, r.i, r.j): r.v for r in rows}
    # 2 counts + 2*DIM first moments + 2*tri second moments
    assert len(got) == 2 * (1 + DIM + DIM * (DIM + 1) // 2)
    for k in (0, 1):
        assert got[(k, 0, 0)] == n[k]
        for i in range(DIM):
            assert got[(k, i + 1, 0)] == s[k][i]
            for j in range(i, DIM):
                assert got[(k, i + 1, j + 1)] == G[k][i, j]


def test_moments_parallelism_invariant(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, fid_moments(emb.repartition(1)).collect()))
    b = sorted(map(tuple, fid_moments(emb.repartition(11)).collect()))
    assert a == b


def test_frechet_distance_properties(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = [tuple(r) for r in fid_moments(emb).collect()]
    fid = frechet_from_moments(rows)
    # distance between two halves of the SAME distribution: small but
    # positive (finite-sample); must be well below the corpus scale
    assert 0.0 <= fid < 1.0
    # identical slices -> FID 0: feed slice 0's moments as both slices
    dup = [r for r in rows if r[0] == 0] + [
        (1, i, j, v) for (slc, i, j, v) in rows if slc == 0
    ]
    assert abs(frechet_from_moments(dup)) < 1e-8
    # a mean shift of delta adds |delta|^2: shift slice 1 first moments
    # by exactly 0.5 in every dim (integer lattice shift keeps exactness)
    n1 = next(v for (slc, i, j, v) in rows if slc == 1 and i == 0 and j == 0)
    d = int(0.5 * Q_SCALE)
    shifted = []
    for slc, i, j, v in rows:
        if slc == 1 and j == 0 and i > 0:
            shifted.append((slc, i, j, v + n1 * d))
        elif slc == 1 and i > 0 and j > 0:
            s_i = next(x for (sl, a, b, x) in rows if sl == 1 and a == i and b == 0)
            s_j = next(x for (sl, a, b, x) in rows if sl == 1 and a == j and b == 0)
            shifted.append((slc, i, j, v + d * s_i + d * s_j + n1 * d * d))
        else:
            shifted.append((slc, i, j, v))
    base_cov_terms = frechet_from_moments(rows)
    got = frechet_from_moments(shifted)
    # covariances are unchanged by a constant shift; the squared-mean term
    # grows by DIM * 0.25 relative to the baseline mean difference --
    # check against the direct recomputation instead of closed form
    mu_shift = np.full(DIM, 0.5)
    base_rows = {(slc, i, j): v for slc, i, j, v in rows}
    mu = {
        k: np.array([base_rows[(k, i + 1, 0)] for i in range(DIM)])
        / base_rows[(k, 0, 0)]
        / Q_SCALE
        for k in (0, 1)
    }
    d0 = mu[0] - mu[1]
    expected_delta = float((d0 - mu_shift) @ (d0 - mu_shift) - d0 @ d0)
    assert abs((got - base_cov_terms) - expected_delta) < 1e-6
