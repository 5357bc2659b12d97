"""Harris corner screen: planted-corner goldens, overflow-safe checksum."""

import numpy as np

from data_model_spark.operators.harris import (
    _CK_P,
    _CK_MUL,
    _CK_WMOD,
    R_THRESH,
    ck_mod,
    harris_features,
    harris_response,
    harris_tiles,
)


def _blank():
    return np.zeros((256, 256), np.uint16)


def test_flat_tile_no_response():
    n, py, px, pr, ck = harris_features(_blank())
    assert (n, pr) == (0, 0)
    assert harris_response(np.full((256, 256), 777, np.uint16)).max() == 0


def test_planted_rectangle_corners():
    # a bright axis-aligned rectangle: edges give 1D structure (R <= 0
    # territory), the four corners give 2D structure (large positive R)
    t = _blank()
    t[64:192, 80:208] = 40000
    R = harris_response(t)
    n, py, px, pr, ck = harris_features(t)
    assert pr == R.max() > R_THRESH
    corners = [(64, 80), (64, 207), (191, 80), (191, 207)]
    assert min(abs(py - cy) + abs(px - cx) for cy, cx in corners) <= 3
    # every strong pixel is near SOME corner, never mid-edge
    ys, xs = np.nonzero(R > R_THRESH)
    ys, xs = ys + 2, xs + 2
    d = np.min(
        [abs(ys - cy) + abs(xs - cx) for cy, cx in corners], axis=0
    )
    assert d.max() <= 6


def test_edge_without_corner_scores_nonpositive():
    # pure vertical step edge: gy = 0, det = -sxy^2 = 0, R = -q^2 <= 0
    t = _blank()
    t[:, 128:] = 30000
    assert harris_response(t).max() <= 0


def test_response_int64_bounds():
    # adversarial max-contrast checkerboard: every intermediate stays
    # int64-exact (documented bound |R| < 7.3e18)
    t = np.zeros((64, 64), np.uint16)
    t[::2, ::2] = 65535
    t[1::2, 1::2] = 65535
    R = harris_response(t)
    assert np.abs(R).max() < 7.3e18


def test_ck_mod_matches_bignum_reference():
    rng = np.random.default_rng(5)
    flat = rng.integers(-(7 * 10**18), 7 * 10**18, size=10000, dtype=np.int64)
    ref = (
        sum(
            (int(x) % _CK_P) * ((i * _CK_MUL) % _CK_WMOD)
            for i, x in enumerate(flat.tolist())
        )
        % _CK_P
    )
    assert ck_mod(flat) == ref


def test_distributed_matches_replay(spark):
    rng = np.random.default_rng(7)
    tiles = {
        (3, 4): rng.integers(0, 65536, (256, 256), dtype=np.uint16),
        (4, 4): rng.integers(0, 65536, (256, 256), dtype=np.uint16),
    }
    rows = [
        {"var": "v", "level": 0, "tile_x": tx, "tile_y": ty,
         "data": t.astype(">u2").tobytes()}
        for (tx, ty), t in tiles.items()
    ]
    df = spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )
    got = {
        (r.tile_x, r.tile_y): (r.n_strong, r.peak_y, r.peak_x, r.peak_r, r.ck_r)
        for r in harris_tiles(df).collect()
    }
    want = {k: harris_features(t) for k, t in tiles.items()}
    assert got == want
