"""SSIM/MSE reconstruction metrics: kernel properties + engine == replay."""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.mosaic_fp import _MOSAIC_N, _r
from data_model_spark.operators.quality import (
    reconstruct_2x,
    ssim_mse,
    ssim_tiles_fp,
)


def test_kernel_constant_tile_is_perfect():
    A = np.full((256, 256), 1234, np.uint16)
    s, m = ssim_mse(A)
    assert s == 1.0 and m == 0.0


def test_kernel_bounds_and_reconstruction():
    rng = np.random.default_rng(7)
    A = rng.integers(0, 65536, (256, 256)).astype(np.uint16)
    B = reconstruct_2x(A)
    # block means preserved exactly (the pyramid kernel's contract)
    assert np.allclose(
        B.reshape(128, 2, 128, 2).mean(axis=(1, 3)),
        A.astype(np.float64).reshape(128, 2, 128, 2).mean(axis=(1, 3)),
    )
    s, m = ssim_mse(A)
    assert 0.0 < s < 1.0 and m > 0.0
    # smoother signal -> higher SSIM, lower MSE than white noise
    G = np.add.outer(np.arange(256), np.arange(256)).astype(np.uint16) * 100
    s2, m2 = ssim_mse(G)
    assert s2 > s and m2 < m


def test_engine_rows_equal_replay(spark, sf_dir):
    out = {
        (r.var, r.tile_x, r.tile_y): (r.ssim, r.mse)
        for r in ssim_tiles_fp(spark, sf_dir).collect()
    }
    cv = replay.merged_canvases(_MOSAIC_N)
    assert set(out) == set(cv)
    for key, A in cv.items():
        s, m = ssim_mse(A)
        assert out[key] == (_r(s, 9), _r(m, 6)), key
