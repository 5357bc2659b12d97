"""Hausdorff trajectory-similarity-join tests: NumPy brute-force equality
(candidate completeness + refine exactness), hand goldens, determinism."""

import itertools

import numpy as np

from data_model_spark.operators.trajectory import _offset_walks, hausdorff_join


def _brute(trajs, d2):
    def h2(A, B):
        D = ((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)
        return int(max(D.min(1).max(), D.min(0).max()))

    out = {}
    for a, b in itertools.combinations(sorted(trajs), 2):
        h = h2(trajs[a], trajs[b])
        if h <= d2:
            out[(a, b)] = h
    return out


def test_matches_bruteforce_on_fixture(spark, sf_dir):
    walks = _offset_walks(spark, sf_dir)
    rows = walks.collect()
    trajs = {}
    for r in rows:
        trajs.setdefault(r.key, []).append((r.x, r.y))
    trajs = {k: np.array(v, dtype=np.int64) for k, v in trajs.items()}
    d2 = 1_000_000  # loose: sf0.001 walks are short, keep the check non-vacuous
    want = _brute(trajs, d2)
    got = {(r.key_a, r.key_b): r.haus_d2 for r in hausdorff_join(walks, d2).collect()}
    assert got == want
    assert len(got) >= 10


def test_hand_goldens(spark):
    rows = []
    # A and B identical -> H=0; C = A shifted by (30, 40) -> H^2 = 2500;
    # D far away -> excluded at d2=5000
    for i, (key, ox, oy) in enumerate([(1, 0, 0), (2, 0, 0), (3, 30, 40), (4, 10000, 0)]):
        for s in range(5):
            rows.append((key, ox + s * 7, oy + s * 3))
    fixes = spark.createDataFrame(rows, "key long, x long, y long")
    got = {(r.key_a, r.key_b): r.haus_d2 for r in hausdorff_join(fixes, 5000).collect()}
    assert got == {(1, 2): 0, (1, 3): 2500, (2, 3): 2500}


def test_asymmetric_subset(spark):
    # B is a sub-segment of A: directed distances differ; H takes the max
    a = [(1, x, 0) for x in range(0, 100, 10)]
    b = [(2, x, 0) for x in range(0, 30, 10)]
    fixes = spark.createDataFrame(a + b, "key long, x long, y long")
    got = hausdorff_join(fixes, 10**6).collect()
    assert len(got) == 1
    # farthest A point (90,0) to nearest B point (20,0) -> 70^2
    assert got[0].haus_d2 == 4900


def test_deterministic_across_parallelism(spark, sf_dir):
    walks = _offset_walks(spark, sf_dir)
    a = sorted(map(tuple, hausdorff_join(walks.repartition(1), 500_000).collect()))
    b = sorted(map(tuple, hausdorff_join(walks.repartition(7), 500_000).collect()))
    assert a == b and len(a) > 0
