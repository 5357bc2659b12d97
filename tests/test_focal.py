"""Focal statistics vs NumPy convolution of the zero-padded global mosaic."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.operators import focal, tiling
from data_model_spark.sources.images import generate_images_df

TILE_PX = tiling.TILE_PX


@pytest.fixture(scope="module")
def merged(spark):
    images = generate_images_df(spark, 24)
    m = tiling.merge_tiles(tiling.build_tiles(images, repartition=False))
    m = m.filter(F.col("level") == 0).cache()
    m.count()
    yield m
    m.unpersist()


def _mosaic_truth(rows, radius):
    """Box-mean the zero-padded global mosaic per var, then crop per tile."""
    k = 2 * radius + 1
    out = {}
    byvar = {}
    for row in rows:
        byvar.setdefault(row.var, []).append(row)
    for var, tiles in byvar.items():
        xs = [t.tile_x for t in tiles]
        ys = [t.tile_y for t in tiles]
        x0, x1 = min(xs), max(xs)
        y0, y1 = min(ys), max(ys)
        W = (x1 - x0 + 1) * TILE_PX
        H = (y1 - y0 + 1) * TILE_PX
        mosaic = np.zeros((H, W), dtype=np.int64)
        for t in tiles:
            canvas = decode_image(t.data, "raw-u16", TILE_PX, TILE_PX)
            # canvas row 0 is the tile's NORTH edge; mosaic row 0 is the
            # northmost tile row (max tile_y)
            mr = (y1 - t.tile_y) * TILE_PX
            mc = (t.tile_x - x0) * TILE_PX
            mosaic[mr : mr + TILE_PX, mc : mc + TILE_PX] = canvas
        P = np.pad(mosaic, radius)
        win = np.lib.stride_tricks.sliding_window_view(P, (k, k))
        mean = (win.sum(axis=(2, 3)) / float(k * k)).astype(np.float32)
        for t in tiles:
            mr = (y1 - t.tile_y) * TILE_PX
            mc = (t.tile_x - x0) * TILE_PX
            out[(var, t.tile_x, t.tile_y)] = mean[
                mr : mr + TILE_PX, mc : mc + TILE_PX
            ]
    return out


@pytest.mark.parametrize("radius", [1, 2])
def test_focal_equals_global_convolution(spark, merged, radius):
    """Every tile's focal canvas equals the global-mosaic convolution crop —
    interior tile borders prove the halo exchange, mosaic edges prove the
    zero-fill semantics."""
    got = {
        (r.var, r.tile_x, r.tile_y): (
            np.frombuffer(r.data, dtype=np.float32).reshape(TILE_PX, TILE_PX),
            r.n_halo,
            r.focal_sum,
            r.focal_min,
            r.focal_max,
        )
        for r in focal.focal_stats(merged, radius=radius).collect()
    }
    want = _mosaic_truth(merged.collect(), radius)
    assert set(got) == set(want)
    halos = [g[1] for g in got.values()]
    assert max(halos) > 0, "fixture has no adjacent tiles — halos untested"
    for key, truth in want.items():
        canvas, _, fsum, fmin, fmax = got[key]
        np.testing.assert_array_equal(canvas, truth, err_msg=str(key))
        assert fsum == pytest.approx(float(truth.astype(np.float64).sum()))
        assert fmin == float(truth.min()) and fmax == float(truth.max())


def test_halo_counts_match_adjacency(spark, merged):
    """n_halo equals the number of existing 8-neighbors of each tile."""
    keys = {(r.var, r.tile_x, r.tile_y) for r in
            merged.select("var", "tile_x", "tile_y").collect()}
    got = {
        (r.var, r.tile_x, r.tile_y): r.n_halo
        for r in focal.focal_stats(merged, radius=1).collect()
    }
    for var, tx, ty in keys:
        expect = sum(
            (var, tx + dx, ty + dy) in keys
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        )
        assert got[(var, tx, ty)] == expect, (var, tx, ty)


def test_single_shuffle_plan(spark, merged):
    out = focal.focal_stats(merged, radius=1)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the executed plan prints the cached merge pipeline inline below the
    # InMemoryTableScan; only the focal operator's own segment counts
    own = plan.split("InMemoryTableScan")[0]
    assert sum(
        1 for line in own.splitlines()
        if "Exchange " in line and "BroadcastExchange" not in line
    ) == 1


def test_bad_radius_rejected(spark, merged):
    with pytest.raises(ValueError):
        focal.focal_stats(merged, radius=0)
