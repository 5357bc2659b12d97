"""Bicubic 2x overzoom: Keys-kernel exactness, linear reproduction,
radius-2 halo continuity, global-mosaic replay equivalence."""

import numpy as np

from data_model_spark.operators.focal import TILE_PX
from data_model_spark.operators.upsample import (
    _fingerprint_q,
    bicubic2x_kernel,
    bicubic_overzoom_tiles,
)


def _keys_w(s, a=-0.5):
    s = abs(s)
    if s <= 1:
        return (a + 2) * s**3 - (a + 3) * s**2 + 1
    if s < 2:
        return a * s**3 - 5 * a * s**2 + 8 * a * s - 4 * a
    return 0.0


def _brute(canvas):
    """Float Keys bicubic at half-pel centers, x16384 (exact in f64:
    values stay far below 2^53)."""
    n = canvas.shape[0] - 4
    out = np.zeros((2 * n, 2 * n), np.int64)
    for r in range(2 * n):
        for c in range(2 * n):
            y, x = r / 2 - 0.25, c / 2 - 0.25
            acc = 0.0
            for ii in range(int(np.floor(y)) - 1, int(np.floor(y)) + 3):
                wy = _keys_w(y - ii)
                for jj in range(int(np.floor(x)) - 1, int(np.floor(x)) + 3):
                    acc += wy * _keys_w(x - jj) * canvas[ii + 2, jj + 2]
            out[r, c] = round(acc * 16384)
    return out


def test_taps_are_the_keys_weights():
    w = [round(_keys_w(s) * 128) for s in (1.75, 0.75, 0.25, 1.25)]
    assert w == [-3, 29, 111, -9]
    assert sum(w) == 128


def test_kernel_matches_bruteforce():
    rng = np.random.default_rng(17)
    canvas = rng.integers(0, 65536, (12, 12)).astype(np.int64)
    assert np.array_equal(bicubic2x_kernel(canvas), _brute(canvas))


def test_constant_and_linear_reproduction():
    canvas = np.full((12, 12), 4321, np.int64)
    assert (bicubic2x_kernel(canvas) == 16384 * 4321).all()
    # cubic convolution reproduces linear fields exactly: f(x) = x
    # sampled at half-pel center c/2 - 1/4 (canvas col offset +2)
    n = 8
    canvas = np.tile(np.arange(n + 4, dtype=np.int64) * 100, (n + 4, 1))
    out = bicubic2x_kernel(canvas)
    cols = np.arange(2 * n)
    want = (16384 * 100 * (2 * (cols / 2 - 0.25) + 4) / 2).astype(np.int64)
    assert np.array_equal(out[0], want)


def test_seam_continuity_radius2(spark):
    # two adjacent stored tiles through the distributed radius-2 halo
    # == the bicubic of their zero-padded concatenation, split in half
    rng = np.random.default_rng(23)
    a = rng.integers(0, 4000, (TILE_PX, TILE_PX), dtype=np.uint16)
    b = rng.integers(0, 4000, (TILE_PX, TILE_PX), dtype=np.uint16)
    rows = [
        {"var": "v", "level": 0, "tile_x": 5, "tile_y": 7,
         "data": a.astype(">u2").tobytes()},
        {"var": "v", "level": 0, "tile_x": 6, "tile_y": 7,
         "data": b.astype(">u2").tobytes()},
    ]
    df = spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )
    got = {
        r.tile_x: (r.sumq, r.minq, r.maxq, r.ckq)
        for r in bicubic_overzoom_tiles(df).collect()
    }
    G = np.zeros((TILE_PX + 4, 2 * TILE_PX + 4), np.int64)
    G[2:-2, 2 : 2 + TILE_PX] = a
    G[2:-2, 2 + TILE_PX : 2 + 2 * TILE_PX] = b
    n = TILE_PX
    for tx, c0 in ((5, 0), (6, n)):
        P = G[:, c0 : c0 + n + 4]
        fp = _fingerprint_q(bicubic2x_kernel(P))
        assert got[tx] == (fp["sumq"], fp["minq"], fp["maxq"], fp["ckq"])
