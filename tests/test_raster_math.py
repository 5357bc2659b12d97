"""Band math + change detection vs NumPy mosaic ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.operators import raster_math, tiling
from data_model_spark.sources.images import (
    generate_images_df,
    generate_revision_df,
)

TILE_PX = tiling.TILE_PX


@pytest.fixture(scope="module")
def merged(spark):
    m = tiling.merge_tiles(
        tiling.build_tiles(generate_images_df(spark, 64), repartition=False)
    ).cache()
    m.count()
    yield m
    m.unpersist()


def _canvases(rows):
    return {
        (r.var, r.level, r.tile_x, r.tile_y): decode_image(
            r.data, "raw-u16", TILE_PX, TILE_PX
        )
        for r in rows
    }


def test_band_ndi_matches_per_tile_numpy(spark, merged):
    """Every joined tile's NDI stats equal a direct NumPy evaluation of the
    same two canvases."""
    rows = merged.collect()
    canv = _canvases(rows)
    got = {
        (r.level, r.tile_x, r.tile_y): (r.n_px, r.ndi_sum, r.ndi_min, r.ndi_max)
        for r in raster_math.band_ndi(merged, "b03", "b04").collect()
    }
    want = {}
    keys_a = {(l, x, y) for (v, l, x, y) in canv if v == "b03"}
    keys_b = {(l, x, y) for (v, l, x, y) in canv if v == "b04"}
    for l, x, y in keys_a & keys_b:
        a = canv[("b03", l, x, y)]
        b = canv[("b04", l, x, y)]
        mask = (a > 0) & (b > 0)
        if not mask.any():
            continue
        af, bf = a[mask].astype(np.float64), b[mask].astype(np.float64)
        ndi = (af - bf) / (af + bf)
        want[(l, x, y)] = (int(mask.sum()), ndi.sum(), ndi.min(), ndi.max())
    assert want, "fixture produced no cross-band overlap tiles"
    assert set(got) == set(want)
    for k, (n, s, lo, hi) in want.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(s, abs=1e-9)
        assert got[k][2] == lo and got[k][3] == hi  # bit-exact per-pixel


def test_band_ndi_no_self_pair(spark, merged):
    """Same band against itself: NDI identically zero on every filled px."""
    out = raster_math.band_ndi(merged, "b03", "b03").collect()
    assert out
    for r in out:
        assert r.ndi_min == 0.0 and r.ndi_max == 0.0 and r.ndi_sum == 0.0


def test_change_stats_zero_on_identical(spark, merged):
    out = raster_math.change_stats(merged, merged)
    agg = out.agg(
        F.sum("n_px_changed"), F.max("max_abs_diff"), F.count("*")
    ).collect()[0]
    assert agg[0] == 0 and agg[1] == 0
    assert agg[2] == merged.count()  # join is total


def test_change_stats_localized_to_revised_scenes(spark):
    """Diffs appear exactly in the tiles the revised scenes touch, and the
    per-tile sums match a NumPy diff of the two canvases."""
    base = generate_images_df(spark, 6)
    revs = generate_revision_df(spark, [0, 3], rev=1)
    old = tiling.merge_tiles(tiling.build_tiles(base, repartition=False)).cache()
    new = tiling.merge_tiles(
        tiling.build_tiles(
            tiling.latest_revision(base.unionByName(revs)), repartition=False
        )
    ).cache()
    oc, nc = _canvases(old.collect()), _canvases(new.collect())
    assert set(oc) == set(nc)
    got = {
        (r.var, r.level, r.tile_x, r.tile_y): (
            r.n_px_changed, r.sum_abs_diff, r.max_abs_diff
        )
        for r in raster_math.change_stats(old, new).collect()
    }
    assert set(got) == set(oc)
    changed = 0
    for k in oc:
        d = np.abs(oc[k].astype(np.int64) - nc[k].astype(np.int64))
        assert got[k] == (int((d > 0).sum()), int(d.sum()), int(d.max())), k
        changed += got[k][0] > 0
    assert changed > 0, "fixture produced no changed tiles"
    old.unpersist(), new.unpersist()


def test_ndi_join_no_cartesian(spark, merged):
    plan = (
        raster_math.band_ndi(merged, "b03", "b04")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
