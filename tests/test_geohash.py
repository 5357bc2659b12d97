"""Geohash: canonical-value goldens + standard-algorithm cross-check."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_model_spark.operators.geohash import ALPHABET, geohash_col


def ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Textbook interval-halving geohash (the published algorithm)."""
    lo_lat, hi_lat, lo_lon, hi_lon = -90.0, 90.0, -180.0, 180.0
    out, bit, ch, even = [], 0, 0, True
    while len(out) < precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lo_lon = mid
            else:
                ch <<= 1
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lo_lat = mid
            else:
                ch <<= 1
                hi_lat = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(ALPHABET[ch])
            bit, ch = 0, 0
    return "".join(out)


def _encode(spark, coords, precision=6):
    pdf = pd.DataFrame(coords, columns=["lon", "lat"])
    df = spark.createDataFrame(pdf)
    return [
        r.gh
        for r in df.select(
            geohash_col(F.col("lon"), F.col("lat"), precision).alias("gh")
        ).collect()
    ]


def test_canonical_example(spark):
    # the Wikipedia/geohash.org classic: (42.605, -5.603) -> ezs42
    assert _encode(spark, [(-5.603, 42.605)], precision=5) == ["ezs42"]


def test_well_known_cities(spark):
    # precomputed with the interval-halving reference below
    coords = [(-0.1278, 51.5074), (139.6917, 35.6895), (-74.0060, 40.7128)]
    got = _encode(spark, coords, precision=6)
    exp = [ref_geohash(lon, lat, 6) for lon, lat in coords]
    assert got == exp


def test_matches_reference_on_grid(spark):
    rng = np.random.default_rng(21)
    coords = [
        (float(lon), float(lat))
        for lon, lat in zip(
            rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200)
        )
    ]
    got = _encode(spark, coords, precision=6)
    exp = [ref_geohash(lon, lat, 6) for lon, lat in coords]
    assert got == exp


def test_edge_of_world(spark):
    # the lon=180 / lat=90 edge clamps into the top cell (no overflow)
    got = _encode(spark, [(180.0, 90.0), (-180.0, -90.0)], precision=6)
    assert got[1] == "000000"
    assert len(got[0]) == 6 and got[0] == ref_geohash(179.9999999, 89.9999999, 6)


def test_prefix_containment(spark):
    # nearby points share prefixes; the bucket query's partition logic
    a, b = (10.30001, 46.30001), (10.30002, 46.30002)
    ga, gb = _encode(spark, [a, b], precision=6)
    assert ga[:4] == gb[:4]
