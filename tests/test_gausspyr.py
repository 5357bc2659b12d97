"""Binomial pyramid: kernel goldens, seam continuity, replay parity."""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.focal import TILE_PX
from data_model_spark.operators.gausspyr import (
    N_IMG,
    PAD,
    _fingerprint,
    gauss_pyramid_fp,
    pyrdown_kernel,
)


def _brute(canvas):
    w = np.array([1, 4, 6, 4, 1], np.int64)
    n = canvas.shape[0] - 2 * PAD
    out = np.zeros((n // 2, n // 2), np.int64)
    for i in range(n // 2):
        for j in range(n // 2):
            acc = 0
            for a in range(5):
                for b in range(5):
                    acc += w[a] * w[b] * canvas[PAD + 2 * i + a - 2, PAD + 2 * j + b - 2]
            out[i, j] = acc
    return out


def test_kernel_matches_bruteforce():
    rng = np.random.default_rng(13)
    canvas = rng.integers(0, 65536, (12, 12)).astype(np.int64)
    assert np.array_equal(pyrdown_kernel(canvas), _brute(canvas))


def test_constant_field():
    canvas = np.full((16, 16), 321, np.int64)
    assert (pyrdown_kernel(canvas) == 256 * 321).all()


def test_engine_matches_replay(spark):
    got = {
        (r.var, r.tile_x, r.tile_y): (r.sum256, r.min256, r.max256, r.ck256)
        for r in gauss_pyramid_fp(spark, "").collect()
    }
    cv = replay.merged_canvases(N_IMG)
    assert len(got) == len(cv)
    for var in replay.mosaic_vars(cv):
        G, tiles, origin = replay.var_mosaic(cv, var)
        Gp = np.pad(G.astype(np.int64), PAD)
        tx_min, ty_max = origin
        for tx, ty in tiles:
            r0, c0 = (ty_max - ty) * TILE_PX, (tx - tx_min) * TILE_PX
            win = Gp[r0 : r0 + TILE_PX + 2 * PAD, c0 : c0 + TILE_PX + 2 * PAD]
            fp = _fingerprint(pyrdown_kernel(win))
            assert got[(var, tx, ty)] == (
                fp["sum256"], fp["min256"], fp["max256"], fp["ck256"],
            ), (var, tx, ty)
