"""Geohash: public test vectors, JVM==NumPy, decode inverse, edges."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.functions.geohash import (
    geohash_col,
    geohash_decode_cols,
    geohash_np,
)

# publicly documented vectors (Wikipedia "Geohash" examples)
VECTORS = [
    (10.40744, 57.64911, 11, "u4pruydqqvj"),
    (-5.60302734375, 42.60498046875, 5, "ezs42"),
    (0.0, 0.0, 1, "s"),
]


def test_public_vectors_numpy():
    for lon, lat, p, want in VECTORS:
        assert geohash_np([lon], [lat], p)[0] == want


def test_public_vectors_jvm(spark):
    for lon, lat, p, want in VECTORS:
        df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
        got = df.select(geohash_col("lon", "lat", p).alias("gh")).collect()[0].gh
        assert got == want


def test_jvm_matches_numpy_bulk(spark):
    rows = [
        (k, (k * 37 % 360000) / 1000.0 - 180.0, (k * 91 % 180000) / 1000.0 - 90.0)
        for k in range(400)
    ]
    df = spark.createDataFrame(rows, "k long, lon double, lat double")
    for p in (1, 4, 7, 12):
        got = {
            r.k: r.gh
            for r in df.select("k", geohash_col("lon", "lat", p).alias("gh")).collect()
        }
        want = geohash_np([r[1] for r in rows], [r[2] for r in rows], p)
        assert got == {r[0]: w for r, w in zip(rows, want)}


def test_decode_is_inverse(spark):
    rows = [
        (k, (k * 613 % 3600) / 10.0 - 180.0, (k * 271 % 1800) / 10.0 - 90.0)
        for k in range(200)
    ]
    df = spark.createDataFrame(rows, "k long, lon double, lat double")
    p = 8
    enc = df.select("k", "lon", "lat", geohash_col("lon", "lat", p).alias("gh"))
    lon_c, lat_c = geohash_decode_cols("gh", p)
    out = enc.select(
        "k", "lon", "lat", lon_c.alias("lon_c"), lat_c.alias("lat_c")
    ).toPandas()
    bx, by = 20, 20  # precision 8 -> 20/20 bits
    assert (np.abs(out.lon - out.lon_c) <= 360.0 / (1 << bx) / 2 + 1e-12).all()
    assert (np.abs(out.lat - out.lat_c) <= 180.0 / (1 << by) / 2 + 1e-12).all()


def test_domain_edges(spark):
    rows = [
        (0, -180.0, -90.0),
        (1, 179.999999, 89.999999),
        (2, -180.0, 89.999999),
        (3, 179.999999, -90.0),
    ]
    df = spark.createDataFrame(rows, "k long, lon double, lat double")
    got = [
        r.gh for r in df.orderBy("k").select(geohash_col("lon", "lat", 4).alias("gh")).collect()
    ]
    assert got == ["0000", "zzzz", "bpbp", "pbpb"]


def test_precision_bounds():
    with pytest.raises(ValueError):
        geohash_col("lon", "lat", 0)
    with pytest.raises(ValueError):
        geohash_col("lon", "lat", 13)
