"""GLCM texture: analytic goldens + engine/replay parity."""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.texture import (
    BIN,
    N_IMG,
    glcm_features,
    glcm_texture_fp,
)


def test_constant_tile_zero_contrast_max_energy():
    t = np.full((256, 256), 1000, np.uint16)
    n, c, d, e = glcm_features(t)
    assert n == 2 * 256 * 255
    assert c == 0 and d == 0
    assert e == n * n  # single co-occurrence cell holds all pairs


def test_checkerboard_max_contrast():
    # alternate levels 0 and 15: every pair is |i-j| = 15
    t = np.zeros((256, 256), np.uint16)
    t[::2, 1::2] = 15 * BIN
    t[1::2, ::2] = 15 * BIN
    n, c, d, e = glcm_features(t)
    assert d == n * 15
    assert c == n * 225


def test_horizontal_stripes_only_vertical_transitions():
    # constant rows alternating between two levels: horizontal pairs are
    # equal (d=0), every vertical pair jumps one level band
    t = np.zeros((256, 256), np.uint16)
    t[1::2, :] = BIN  # level 1
    n, c, d, e = glcm_features(t)
    horiz = 256 * 255
    vert = 256 * 255
    assert d == vert * 1  # all vertical transitions are |0-1| = 1
    assert c == vert * 1


def test_engine_matches_replay(spark):
    got = {
        (r.var, r.tile_x, r.tile_y): (r.n_pairs, r.contrast, r.dissim, r.energy)
        for r in glcm_texture_fp(spark, "").collect()
    }
    cv = replay.merged_canvases(N_IMG)
    assert len(got) == len(cv)
    for key in sorted(cv):
        assert got[key] == glcm_features(cv[key]), key
