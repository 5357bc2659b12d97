"""Quadkey: public-definition vectors, JVM==NumPy, decode inverse,
agreement with render.mercator_tile_for."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.functions.quadkey import (
    mercator_tile_cols,
    quadkey_col,
    quadkey_decode_cols,
    quadkey_np,
)

# the publicly documented Bing example: tile (3, 5) at level 3 -> "213"
VECTORS = [
    (3, 5, 3, "213"),
    (0, 0, 1, "0"),
    (1, 0, 1, "1"),
    (0, 1, 1, "2"),
    (1, 1, 1, "3"),
    (35210, 21493, 16, quadkey_np([35210], [21493], 16)[0]),
]


def test_bing_example_numpy():
    assert quadkey_np([3], [5], 3)[0] == "213"
    # digit semantics: x bit -> +1, y bit -> +2
    assert quadkey_np([0b101], [0b011], 3)[0] == "123"


def test_jvm_matches_numpy(spark):
    rows = [(k, (k * 613) % 4096, (k * 271) % 4096) for k in range(300)]
    df = spark.createDataFrame(rows, "k long, tx long, ty long")
    got = {
        r.k: r.qk
        for r in df.select(
            "k", quadkey_col(F.col("tx"), F.col("ty"), 12).alias("qk")
        ).collect()
    }
    want = quadkey_np([r[1] for r in rows], [r[2] for r in rows], 12)
    assert got == {r[0]: w for r, w in zip(rows, want)}


def test_decode_is_inverse(spark):
    rows = [(k, (k * 613) % 4096, (k * 271) % 4096) for k in range(200)]
    df = spark.createDataFrame(rows, "k long, tx long, ty long")
    enc = df.select(
        "k", "tx", "ty", quadkey_col(F.col("tx"), F.col("ty"), 12).alias("qk")
    )
    dx, dy = quadkey_decode_cols("qk", 12)
    out = enc.select("tx", "ty", dx.alias("dx"), dy.alias("dy")).toPandas()
    assert (out.tx == out.dx).all() and (out.ty == out.dy).all()


def test_tile_assignment_matches_render(spark):
    from data_model_spark.operators import render

    pts = [(-0.1276, 51.5072), (139.6917, 35.6895), (-58.3816, -34.6037)]
    df = spark.createDataFrame(
        [(i, lo, la) for i, (lo, la) in enumerate(pts)],
        "k long, lon double, lat double",
    )
    tx, ty = mercator_tile_cols("lon", "lat", 13)
    got = {
        r.k: (r.tx, r.ty)
        for r in df.select("k", tx.alias("tx"), ty.alias("ty")).collect()
    }
    for i, (lo, la) in enumerate(pts):
        assert got[i] == render.mercator_tile_for(lo, la, 13)


def test_zoom_bounds():
    with pytest.raises(ValueError):
        quadkey_col(F.lit(0), F.lit(0), 0)
