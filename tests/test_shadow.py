"""Cloud-shadow projection: displacement semantics + replay parity."""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.shadow import (
    N_IMG,
    PAD,
    SHIFT,
    T_CLOUD,
    T_DARK,
    shadow_kernel,
    shadow_mask_fp,
)


def _pad(core):
    p = np.zeros((core.shape[0] + 2 * PAD, core.shape[1] + 2 * PAD), np.int64)
    p[PAD:-PAD, PAD:-PAD] = core
    return p


def test_single_cloud_pixel_casts_one_shadow():
    core = np.zeros((16, 16), np.int64)
    core[5, 9] = T_CLOUD + 100  # one cloud pixel
    fp = shadow_kernel(_pad(core), PAD)
    assert fp["n_cloud"] == 1
    assert fp["n_pred"] == 1  # shadow predicted at (5+dy, 9+dx)
    assert fp["n_conf"] == 1  # that cell is dark (zero)
    dy, dx = SHIFT
    # checksum localizes the confirmed pixel at the displaced position
    idx = (5 + dy) * 16 + (9 + dx)
    from data_model_spark.operators.upsample import _CK_MOD, _CK_MUL

    assert fp["ck"] == (idx * _CK_MUL) % _CK_MOD


def test_bright_ground_blocks_confirmation():
    core = np.zeros((16, 16), np.int64)
    core[5, 9] = T_CLOUD + 100
    dy, dx = SHIFT
    core[5 + dy, 9 + dx] = T_DARK + 1  # too bright to confirm
    fp = shadow_kernel(_pad(core), PAD)
    assert fp["n_pred"] == 1 and fp["n_conf"] == 0


def test_cloud_in_halo_casts_into_tile():
    # cloud pixel in the halo strip north-west of the core: its shadow
    # lands inside the core even though the cloud itself is outside
    p = np.zeros((16 + 2 * PAD, 16 + 2 * PAD), np.int64)
    dy, dx = SHIFT
    # source of the shadow that lands at core (2, 2); with SHIFT=(3,-2)
    # this sits at canvas row PAD-1 — inside the halo, above the core
    p[PAD + 2 - dy, PAD + 2 - dx] = T_CLOUD + 5
    fp = shadow_kernel(p, PAD)
    assert fp["n_cloud"] == 0  # the cloud itself is outside the core
    assert fp["n_pred"] == 1 and fp["n_conf"] == 1


def test_engine_matches_replay(spark):
    from data_model_spark.operators.focal import TILE_PX

    got = {
        (r.var, r.tile_x, r.tile_y): (r.n_cloud, r.n_pred, r.n_conf, r.ck)
        for r in shadow_mask_fp(spark, "").collect()
    }
    cv = replay.merged_canvases(N_IMG)
    assert len(got) == len(cv)
    total_cloud = 0
    for var in replay.mosaic_vars(cv):
        G, tiles, origin = replay.var_mosaic(cv, var)
        Gp = np.pad(G.astype(np.int64), PAD)
        tx_min, ty_max = origin
        for tx, ty in tiles:
            r0, c0 = (ty_max - ty) * TILE_PX, (tx - tx_min) * TILE_PX
            win = Gp[r0 : r0 + TILE_PX + 2 * PAD, c0 : c0 + TILE_PX + 2 * PAD]
            fp = shadow_kernel(win, PAD)
            assert got[(var, tx, ty)] == (
                fp["n_cloud"], fp["n_pred"], fp["n_conf"], fp["ck"],
            ), (var, tx, ty)
            total_cloud += fp["n_cloud"]
    assert total_cloud > 0  # fixture is non-vacuous
