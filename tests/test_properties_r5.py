"""Property-based tests for the round-5 third-wave numeric kernels.

Pure Python/NumPy — no Spark session; the randomized invariants behind
the goldens in test_hilbert / test_quality / test_changepoint /
test_polygon_metrics.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_model_spark.operators.quality import reconstruct_2x, ssim_mse


def _hilbert_scalar(x: int, y: int, bits: int) -> int:
    d, s = 0, 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


@settings(max_examples=6, deadline=None)
@given(bits=st.integers(2, 6))
def test_hilbert_bijective_unit_steps_any_bits(bits):
    n = 1 << bits
    cells = {}
    for x in range(n):
        for y in range(n):
            d = _hilbert_scalar(x, y, bits)
            assert d not in cells
            cells[d] = (x, y)
    assert min(cells) == 0 and max(cells) == n * n - 1
    for d in range(1, n * n):
        (x0, y0), (x1, y1) = cells[d - 1], cells[d]
        assert abs(x1 - x0) + abs(y1 - y0) == 1


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), scale=st.integers(1, 60000))
def test_ssim_bounds_and_perfect_iff_lossless(seed, scale):
    rng = np.random.default_rng(seed)
    A = rng.integers(0, scale + 1, (64, 64)).astype(np.uint16)
    s, m = ssim_mse(A)
    assert -1.0 <= s <= 1.0 and m >= 0.0
    assert (m == 0.0) == (s == 1.0)
    # reconstruction preserves block means exactly
    B = reconstruct_2x(A)
    assert np.allclose(
        B.reshape(32, 2, 32, 2).mean(axis=(1, 3)),
        A.astype(np.float64).reshape(32, 2, 32, 2).mean(axis=(1, 3)),
    )
    # a 2x2-constant image reconstructs losslessly
    C = np.repeat(np.repeat(A[::2, ::2], 2, axis=0), 2, axis=1)
    sc, mc = ssim_mse(C)
    assert sc == 1.0 and mc == 0.0


@settings(max_examples=60, deadline=None)
@given(
    n1=st.integers(2, 200),
    n2=st.integers(2, 200),
    lo=st.integers(0, 1000),
    shift=st.integers(1, 500),
)
def test_cusum_integer_statistic_peaks_at_the_step(n1, n2, lo, shift):
    """For a clean two-level stream the |n*S_t| maximizer is exactly the
    step boundary (the single-changepoint MLE property the operator
    implements in integers)."""
    c = np.array([lo] * n1 + [lo + shift] * n2, dtype=np.int64)
    n, total = len(c), int(c.sum())
    cum = np.cumsum(c)
    t = np.arange(1, n + 1, dtype=np.int64)
    ns = n * cum - t * total
    best = int(np.argmax(np.abs(ns))) + 1  # earliest argmax: np.argmax ties->first
    assert best == n1


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), k=st.integers(3, 12))
def test_shoelace_matches_numpy_cross_for_random_convex_polygons(seed, k):
    rng = np.random.default_rng(seed)
    # random convex polygon: sort random points by angle around centroid
    pts = rng.integers(-10000, 10000, size=(k, 2)).astype(np.int64)
    ctr = pts.mean(axis=0)
    order = np.argsort(np.arctan2(pts[:, 1] - ctr[1], pts[:, 0] - ctr[0]))
    p = pts[order]
    nxt = np.roll(p, -1, axis=0)
    cross = p[:, 0] * nxt[:, 1] - nxt[:, 0] * p[:, 1]
    a2 = int(abs(cross.sum()))
    # reference: 2 * polyarea via the standard numpy formulation
    ref = int(
        abs(
            np.dot(p[:, 0], np.roll(p[:, 1], -1))
            - np.dot(np.roll(p[:, 0], -1), p[:, 1])
        )
    )
    assert a2 == ref
    # reversing orientation preserves |2A|
    q = p[::-1]
    nq = np.roll(q, -1, axis=0)
    a2r = int(abs((q[:, 0] * nq[:, 1] - nq[:, 0] * q[:, 1]).sum()))
    assert a2r == a2
