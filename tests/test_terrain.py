"""Terrain derivatives vs NumPy Horn over the zero-padded global mosaic."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.operators import terrain, tiling
from data_model_spark.operators.terrain import horn_terrain
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


def _truth(rows):
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
            mr = (y1 - t.tile_y) * TILE_PX
            mc = (t.tile_x - x0) * TILE_PX
            mosaic[mr : mr + TILE_PX, mc : mc + TILE_PX] = canvas
        slope, shade = horn_terrain(np.pad(mosaic, 1))
        for t in tiles:
            mr = (y1 - t.tile_y) * TILE_PX
            mc = (t.tile_x - x0) * TILE_PX
            out[(var, t.tile_x, t.tile_y)] = (
                shade[mr : mr + TILE_PX, mc : mc + TILE_PX],
                np.degrees(slope[mr : mr + TILE_PX, mc : mc + TILE_PX]),
            )
    return out


def test_hillshade_equals_global_mosaic(spark, merged):
    got = {
        (r.var, r.tile_x, r.tile_y): (
            np.frombuffer(r.data, dtype=np.uint8).reshape(TILE_PX, TILE_PX),
            r.n_halo,
            r.slope_mean_deg,
            r.slope_max_deg,
            r.shade_mean,
        )
        for r in terrain.hillshade(merged).collect()
    }
    rows = merged.select("var", "tile_x", "tile_y", "data").collect()
    want = _truth(rows)
    assert set(got) == set(want)
    interior = 0
    for key, (shade_w, slope_w) in want.items():
        shade_g, n_halo, sm, sx, hm = got[key]
        assert (shade_g == shade_w).all(), key  # pixel-exact, borders included
        assert sm == round(float(slope_w.mean()), 6)
        assert sx == round(float(slope_w.max()), 6)
        assert hm == round(float(shade_w.astype(np.float64).mean()), 6)
        if n_halo == 8:
            interior += 1
    assert interior > 0  # halo path genuinely exercised


def test_flat_surface_properties():
    flat = np.full((66, 66), 500, dtype=np.int64)
    slope, shade = horn_terrain(flat)
    assert (slope == 0).all()
    # zenith 45 deg on a flat surface: shade = 255*cos(45) ~ 180
    assert (shade == 180).all()


def test_ramp_slope_exact():
    # east-facing unit ramp: gx = 1, gy = 0 -> slope = atan(1) = 45 deg
    ramp = np.tile(np.arange(66, dtype=np.int64), (66, 1))
    slope, _ = horn_terrain(ramp)
    inner = slope[2:-2, 2:-2]
    assert np.allclose(np.degrees(inner), 45.0)
