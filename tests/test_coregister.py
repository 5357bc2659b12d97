"""Co-registration: planted-lag recovery + replay parity + exactness."""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.coregister import (
    MAX_SHIFT,
    PLANTED,
    best_shift,
    shift_correlation,
    shift_scores_kernel,
)
from data_model_spark.operators.focal import TILE_PX


def _tiles_df(spark, canvases):
    rows = [
        {
            "var": var,
            "level": 0,
            "tile_x": tx,
            "tile_y": ty,
            "data": c.astype(">u2").tobytes(),  # raw-u16 tile codec is BE
        }
        for (var, tx, ty), c in canvases.items()
    ]
    return spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )


def _rand_canvases(seed, keys):
    rng = np.random.default_rng(seed)
    return {
        k: rng.integers(0, 4000, (TILE_PX, TILE_PX), dtype=np.uint16)
        for k in keys
    }


def _replay_scores(canvases, pad, s, planted):
    acc = {}
    w = 2 * s + 1
    for var in replay.mosaic_vars(canvases):
        G, tiles, origin = replay.var_mosaic(canvases, var)
        Gp = np.pad(G.astype(np.int64), pad)
        for tx, ty in tiles:
            tx_min, ty_max = origin
            r0, c0 = (ty_max - ty) * TILE_PX, (tx - tx_min) * TILE_PX
            win = Gp[r0 : r0 + TILE_PX + 2 * pad, c0 : c0 + TILE_PX + 2 * pad]
            for i, v in enumerate(shift_scores_kernel(win, pad, s, planted)):
                key = (var, i // w - s, i % w - s)
                acc[key] = acc.get(key, 0) + v
    return acc


def test_distributed_matches_replay_with_gap(spark):
    """2x2 mosaic with a missing corner (halo zeros on interior edges)."""
    keys = [("b1", 0, 0), ("b1", 1, 0), ("b1", 0, 1)]
    cv = _rand_canvases(7, keys)
    got = {
        (r.var, int(r.dy), int(r.dx)): int(r.score)
        for r in shift_correlation(_tiles_df(spark, cv)).collect()
    }
    pad = MAX_SHIFT + max(abs(PLANTED[0]), abs(PLANTED[1]))
    want = _replay_scores(cv, pad, MAX_SHIFT, PLANTED)
    assert got == want
    assert len(got) == (2 * MAX_SHIFT + 1) ** 2


def test_recovers_planted_lag(spark):
    """argmax of the correlation surface is the aligning lag -PLANTED."""
    keys = [("b1", tx, ty) for tx in range(2) for ty in range(2)]
    cv = _rand_canvases(11, keys)
    best = best_shift(shift_correlation(_tiles_df(spark, cv))).collect()
    assert len(best) == 1
    assert (int(best[0].dy), int(best[0].dx)) == (-PLANTED[0], -PLANTED[1])


def test_zero_planted_peak_at_origin(spark):
    cv = _rand_canvases(13, [("b2", 5, 5)])
    scores = shift_correlation(_tiles_df(spark, cv), planted=(0, 0))
    best = best_shift(scores).collect()
    assert (int(best[0].dy), int(best[0].dx)) == (0, 0)
    # lag-0 score is the exact energy of the canvas
    got = {
        (int(r.dy), int(r.dx)): int(r.score) for r in scores.collect()
    }
    c = next(iter(cv.values())).astype(np.int64)
    assert got[(0, 0)] == int(np.sum(c * c))


def test_kernel_energy_dominates():
    """Cauchy-Schwarz peak argument on a single zero-padded canvas."""
    rng = np.random.default_rng(3)
    pad = MAX_SHIFT
    c = np.zeros((TILE_PX + 2 * pad, TILE_PX + 2 * pad), dtype=np.int64)
    c[pad:-pad, pad:-pad] = rng.integers(0, 65536, (TILE_PX, TILE_PX))
    out = shift_scores_kernel(c, pad, MAX_SHIFT, (0, 0))
    w = 2 * MAX_SHIFT + 1
    assert int(np.argmax(out)) == MAX_SHIFT * w + MAX_SHIFT
