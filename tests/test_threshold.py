"""Otsu tests: distributed scan equality with the sequential NumPy
reference on bimodal/uniform/skewed data, histogram-pass exactness,
degenerate-end exclusion, tie behavior, and the real-mosaic path."""

import numpy as np

from data_model_spark.operators.threshold import (
    histogram_tiles,
    otsu_scan,
    otsu_threshold,
    reference_otsu,
)


def _hist_df(spark, values):
    acc = np.bincount(np.asarray(values, dtype=np.int64))
    nz = np.flatnonzero(acc)
    return spark.createDataFrame(
        [(int(v), int(acc[v])) for v in nz], "v long, cnt long"
    )


def _spark_otsu(spark, values):
    return otsu_threshold(_hist_df(spark, values)).collect()[0]


def test_bimodal_matches_reference(spark):
    rng = np.random.default_rng(4)
    vals = np.concatenate(
        [rng.normal(80, 10, 4000), rng.normal(200, 15, 6000)]
    ).clip(0, 255).astype(np.int64)
    row = _spark_otsu(spark, vals)
    assert row.t == reference_otsu(vals)
    assert 100 < row.t < 190  # threshold sits between the modes
    assert row.w0 + row.w1 == len(vals)


def test_uniform_and_skewed_match_reference(spark):
    rng = np.random.default_rng(9)
    for vals in (
        rng.integers(0, 64, 5000),
        (rng.exponential(20, 5000)).astype(np.int64).clip(0, 500),
        np.array([3, 3, 3, 900]),
    ):
        assert _spark_otsu(spark, vals).t == reference_otsu(vals)


def test_scan_excludes_degenerate_ends(spark):
    # two bins: only the lower can be a threshold (w0 < W required)
    rows = otsu_scan(_hist_df(spark, [1, 1, 5])).collect()
    assert [r.t for r in rows] == [1]


def test_two_point_scores_exact(spark):
    # hand-computable: values {0 x2, 10 x2}; t=0: w0=2,w1=2,
    # num = s0*W - S*w0 = 0*4 - 20*2 = -40, score = 1600/4 = 400
    rows = otsu_scan(_hist_df(spark, [0, 0, 10, 10])).collect()
    assert len(rows) == 1 and rows[0].score == 400.0


def test_histogram_tiles_exact(spark):
    from data_model_spark.codecs import encode_image
    from data_model_spark.operators.tiling import TILE_PX

    rng = np.random.default_rng(2)
    tiles = []
    acc = np.zeros(300, dtype=np.int64)
    for _ in range(5):
        z = rng.integers(0, 300, (TILE_PX, TILE_PX)).astype(np.uint16)
        acc += np.bincount(z.ravel(), minlength=300)
        tiles.append((encode_image(z, "raw-u16"),))
    df = spark.createDataFrame(tiles, "data binary")
    got = {r.v: r.cnt for r in histogram_tiles(df).collect()}
    want = {int(v): int(acc[v]) for v in np.flatnonzero(acc)}
    assert got == want


def test_mosaic_threshold_matches_global_reference(spark):
    from data_model_spark.operators.hydrology import _merged_tiles
    from data_model_spark.operators.threshold import otsu_mosaic

    tiles = _merged_tiles(spark)
    import pandas as pd
    from data_model_spark.codecs import decode_image
    from data_model_spark.operators.tiling import TILE_PX

    pdf = tiles.select("data").toPandas()
    allpx = np.concatenate(
        [decode_image(b, "raw-u16", TILE_PX, TILE_PX).ravel() for b in pdf["data"]]
    )
    row = otsu_mosaic(spark, "/root/testdata/sf0.001")
    got = row.collect()[0]
    assert got.t == reference_otsu(allpx)
    assert got.w0 + got.w1 == allpx.size


def test_deterministic_across_parallelism(spark):
    rng = np.random.default_rng(8)
    vals = rng.integers(0, 2000, 20000)
    df = _hist_df(spark, vals)
    a = sorted(map(tuple, otsu_scan(df.repartition(1)).collect()))
    b = sorted(map(tuple, otsu_scan(df.repartition(11)).collect()))
    assert a == b and len(a) > 100


def test_equalize_lut_properties():
    from data_model_spark.operators.threshold import equalize_lut

    rng = np.random.default_rng(3)
    vals = rng.integers(10, 5000, 30000)
    acc = np.bincount(vals, minlength=65536)
    lut = equalize_lut(
        [(int(v), int(acc[v])) for v in np.flatnonzero(acc)], 256
    )
    assert lut.min() >= 0 and lut.max() == 255
    assert (np.diff(lut) >= 0).all()  # monotone
    nz = np.flatnonzero(acc)
    assert lut[nz[0]] == 0  # darkest occupied bin maps to 0


def test_equalize_matches_numpy_reference(spark):
    from data_model_spark.codecs import decode_image, encode_image
    from data_model_spark.operators.threshold import (
        equalize_lut,
        equalize_tiles,
    )
    from data_model_spark.operators.tiling import TILE_PX

    rng = np.random.default_rng(5)
    tiles, canvases = [], {}
    for tx in range(3):
        z = (rng.normal(2000, 600, (TILE_PX, TILE_PX))).clip(0, 65535).astype(np.uint16)
        canvases[tx] = z
        tiles.append(("b01", tx, 0, encode_image(z, "raw-u16")))
    df = spark.createDataFrame(
        tiles, "var string, tile_x long, tile_y long, data binary"
    )
    got = {
        (r.tile_x): (r.eq_sum, r.eq_min, r.eq_max)
        for r in equalize_tiles(df, 256).collect()
    }
    # sequential: global histogram over ALL tiles, then per-tile remap
    allpx = np.concatenate([z.ravel() for z in canvases.values()])
    acc = np.bincount(allpx, minlength=65536)
    lut = equalize_lut(
        [(int(v), int(acc[v])) for v in np.flatnonzero(acc)], 256
    )
    for tx, z in canvases.items():
        eq = lut[z]
        assert got[tx] == (int(eq.sum()), int(eq.min()), int(eq.max())), tx


def test_equalize_single_value_image(spark):
    from data_model_spark.codecs import encode_image
    from data_model_spark.operators.threshold import equalize_tiles
    from data_model_spark.operators.tiling import TILE_PX

    z = np.full((TILE_PX, TILE_PX), 777, dtype=np.uint16)
    df = spark.createDataFrame(
        [("b01", 0, 0, encode_image(z, "raw-u16"))],
        "var string, tile_x long, tile_y long, data binary",
    )
    r = equalize_tiles(df, 256).collect()[0]
    assert (r.eq_sum, r.eq_min, r.eq_max) == (0, 0, 0)
