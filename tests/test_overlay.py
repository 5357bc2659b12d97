"""Polygon-polygon overlay join vs NumPy all-pairs brute force."""

import numpy as np
import pytest

from data_model_spark.functions import geometry as G
from data_model_spark.operators import spatial


def _star(cx, cy, radii, phase=0.0) -> np.ndarray:
    """Star-shaped (hence simple) polygon around (cx, cy)."""
    k = len(radii)
    ang = phase + np.arange(k) * (2 * np.pi / k)
    return np.stack([cx + radii * np.cos(ang), cy + radii * np.sin(ang)], axis=1)


def _random_polys(n, seed, span=4.0) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    out = {}
    for i in range(n):
        cx = 8.0 + rng.uniform(0, span)
        cy = 45.0 + rng.uniform(0, span)
        k = int(rng.integers(3, 9))
        radii = rng.uniform(0.05, 0.6, size=k)
        out[f"p{seed}_{i}"] = _star(cx, cy, radii, phase=rng.uniform(0, 2 * np.pi))
    return out


def _brute(pa: dict, pb: dict) -> set[tuple[str, str]]:
    return {
        (a, b)
        for a, ra in pa.items()
        for b, rb in pb.items()
        if G.polygons_intersect(ra, rb)
    }


def test_kernel_cases():
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    # containment both directions (no vertex of the big one in the small one)
    tiny = np.array([[0.4, 0.4], [0.6, 0.4], [0.5, 0.6]])
    assert G.polygons_intersect(sq, tiny) and G.polygons_intersect(tiny, sq)
    # pierce-through: all vertices outside, edges cross
    bar = np.array([[-1.0, 0.4], [2.0, 0.4], [2.0, 0.6], [-1.0, 0.6]])
    assert G.polygons_intersect(sq, bar) and G.polygons_intersect(bar, sq)
    # disjoint
    far = tiny + 10.0
    assert not G.polygons_intersect(sq, far)
    # partial overlap
    sh = sq + 0.5
    assert G.polygons_intersect(sq, sh)
    # edge-touching: boundary contact counts as intersecting (OGC
    # ST_Intersects-style) — the shared-edge vertices land on the included
    # half of the neighbor's boundary under the half-open even-odd rule
    adj = sq + np.array([1.0, 0.0])
    assert G.polygons_intersect(sq, adj) and G.polygons_intersect(adj, sq)


@pytest.mark.parametrize("res", [8, 11])
def test_overlay_join_matches_bruteforce(spark, res):
    pa = _random_polys(25, seed=7)
    pb = _random_polys(40, seed=11)
    want = _brute(pa, pb)
    assert 20 <= len(want) < 25 * 40  # non-vacuous, non-complete
    got = {
        (r.a_id, r.b_id)
        for r in spatial.polygon_overlay_join(
            spatial.polygons_df(spark, pa), spatial.polygons_df(spark, pb), res=res
        ).collect()
    }
    assert got == want


def test_overlay_join_no_broadcast_path(spark):
    """Forcing the shuffled candidate join returns the identical pair set."""
    pa = _random_polys(10, seed=3)
    pb = _random_polys(15, seed=5)
    base = spatial.polygon_overlay_join(
        spatial.polygons_df(spark, pa), spatial.polygons_df(spark, pb), res=10
    )
    shuffled = spatial.polygon_overlay_join(
        spatial.polygons_df(spark, pa),
        spatial.polygons_df(spark, pb),
        res=10,
        broadcast_a=False,
    )
    assert {tuple(r) for r in base.collect()} == {tuple(r) for r in shuffled.collect()}
    assert {tuple(r) for r in base.collect()} == {
        (a, b) for a, b in _brute(pa, pb)
    }
