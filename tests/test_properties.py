"""Property-based tests (hypothesis) for the deterministic numeric kernels.

The reference tests with hand-computed goldens (SURVEY §5.1); these extend
that with randomized invariants — the properties the goldens instantiate.
Pure NumPy, no Spark session needed.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_model_spark.functions import geometry, gridlib, warp
from data_model_spark.operators import downsample as ds


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(2, 40),
    w=st.integers(2, 40),
    by=st.integers(1, 6),
    bx=st.integers(1, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_block_mean_matches_direct_per_block(h, w, by, bx, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 5000, size=(h, w)).astype(np.float64)
    th, tw = h // by, w // bx
    if th == 0 or tw == 0:
        return
    out = ds.block_mean(a, th, tw)
    assert out.shape == (th, tw)
    eff_by, eff_bx = h // th, w // tw
    if eff_by <= 1 or eff_bx <= 1:
        # reference semantics: block dim <= 1 -> strided subsample
        # (conversion/utils.py:126-130), not mean
        yi = np.linspace(0, h - 1, th, dtype=int)
        xi = np.linspace(0, w - 1, tw, dtype=int)
        assert np.array_equal(out, a[yi, :][:, xi])
        return
    # crop-then-reduce semantics (reference crops non-divisible edges)
    for i in range(th):
        for j in range(tw):
            blk = a[i * eff_by : (i + 1) * eff_by, j * eff_bx : (j + 1) * eff_bx]
            assert np.isclose(out[i, j], blk.mean())


@settings(max_examples=100, deadline=None)
@given(dim=st.integers(1, 20000), target=st.integers(1, 8192))
def test_aligned_chunk_size_invariants(dim, target):
    c = gridlib.aligned_chunk_size(dim, target)
    assert 1 <= c <= max(dim, target)
    # aligned chunks divide the dim evenly, or the fallback is the target
    assert dim % c == 0 or c == target or c == dim
    # never smaller than 51% of target when a divisor was chosen
    if dim % c == 0 and c != dim and c != target:
        assert c > 0.51 * target


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 5000),
    h=st.integers(1, 5000),
    min_dim=st.integers(16, 512),
)
def test_overview_levels_monotone_halving(w, h, min_dim):
    levels = gridlib.overview_levels(w, h, min_dim)
    if min(w, h) < min_dim:
        assert levels == []
        return
    assert levels[0]["width"] == w and levels[0]["height"] == h
    for prev, cur in zip(levels, levels[1:]):
        assert cur["width"] == w // cur["scale_relative"]
        assert min(cur["width"], cur["height"]) >= min_dim
        # halving ratio between adjacent levels in [1.8, 2.2] like the
        # reference invariant (conftest.py:327-341) — integer floor allows
        # slight drift
        rw = prev["width"] / cur["width"]
        assert 1.8 <= rw <= 2.2 or prev["width"] < 4


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(3, 12),
    npts=st.integers(1, 60),
)
def test_pip_boundary_consistency(seed, n, npts):
    """Every point strictly inside the polygon's bbox classifies without
    crashing, and points far outside the bbox are never inside."""
    rng = np.random.default_rng(seed)
    # evenly spread angles + bounded jitter: the polygon provably encloses
    # its center (star-shaped about (10, 46) with full angular coverage)
    base = np.linspace(0, 2 * np.pi, n, endpoint=False)
    # jitter < 0.4 * gap keeps every angular gap (incl. wraparound) < pi
    # for n >= 3, which guarantees the center is enclosed
    ang = base + rng.uniform(0, 0.4 * 2 * np.pi / n, n)
    r = rng.uniform(0.5, 1.0, n)
    ring = np.column_stack([10 + r * np.cos(ang), 46 + r * np.sin(ang)])
    px = rng.uniform(8, 12, npts)
    py = rng.uniform(44, 48, npts)
    inside = geometry.points_in_polygon(px, py, ring)
    far = geometry.points_in_polygon(px + 100, py, ring)
    assert not far.any()
    # centroid of a star-shaped-around-origin polygon is inside
    c = geometry.points_in_polygon(np.array([10.0]), np.array([46.0]), ring)
    assert c[0]


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**31 - 1))
def test_warp_identity_gcps_roundtrip(seed):
    """GCPs mapping (line,pixel) linearly to (lat,lon): warping then sampling
    the output at the GCP lat/lons reproduces the source values (away from
    edges)."""
    rng = np.random.default_rng(seed)
    h, w = 24, 36
    src = rng.integers(0, 200, size=(h, w)).astype(np.float64)
    line = np.array([0, 0, h - 1, h - 1, h // 2])
    pixel = np.array([0, w - 1, 0, w - 1, w // 2])
    lat = 39 + 2 * line / (h - 1)
    lon = 15 + 3 * pixel / (w - 1)
    out, lons, lats = warp.warp_gcp(src, line, pixel, lat, lon, nodata=-1.0)
    interior = out[2:-2, 2:-2]
    assert (interior != -1.0).all()
    assert interior.min() >= src.min() - 1e-9
    assert interior.max() <= src.max() + 1e-9


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    sf=st.floats(1e-4, 10.0, allow_nan=False),
    ao=st.floats(-100.0, 100.0, allow_nan=False),
)
def test_cf_codec_roundtrip(seed, sf, ao):
    rng = np.random.default_rng(seed)
    packed = rng.integers(0, 10000, size=50)
    unpacked = gridlib.cf_decode(packed, sf, ao)
    repacked = np.round((unpacked - ao) / sf).astype(np.int64)
    assert (repacked == packed).all()
