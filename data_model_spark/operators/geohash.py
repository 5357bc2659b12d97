"""Geohash encoding: the base32 string spatial index.

The interoperable sibling of the engine's int64 cell ids (`spatial.
_pack_cell`) and space-filling layouts (`layout.py` Z-order/Hilbert):
geohashes are what external catalogs, Elasticsearch-style geo queries,
and tile caches key on, and their prefix property (shared prefix =>
shared containment) makes them a natural partition/bucket column for
world-scale tables.  Encoding is the classic bit-interleave: quantize
lon to ceil(5p/2) bits and lat to floor(5p/2) bits, interleave MSB
first starting with lon, then emit 5-bit groups through the
"0123456789bcdefghjkmnpqrstuvwxyz" alphabet.

Spark-first shape: the whole encoder is pure JVM column arithmetic —
30 shift/mask terms (static unroll, plan size O(bits)) plus six
substring lookups; no UDF, no Python, fully codegen-able.  The oracle
is GENERATIVE DuckDB SQL over the identical integer expression, so
agreement is exact by construction (integer ops have no rounding at
all).  At 10^12 rows this is a map-only pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
PRECISION = 6  # 6 chars = 30 bits (lon 15, lat 15), ~1.2 km x 0.6 km


def geohash_col(lon: Column, lat: Column, precision: int = PRECISION) -> Column:
    """Base32 geohash of (lon, lat) as a pure JVM column expression."""
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    x = F.floor((lon + 180.0) / 360.0 * (1 << nlon)).cast("long")
    y = F.floor((lat + 90.0) / 180.0 * (1 << nlat)).cast("long")
    # clamp the lon=180 / lat=90 upper edge into the top cell
    x = F.least(x, F.lit((1 << nlon) - 1))
    y = F.least(y, F.lit((1 << nlat) - 1))
    # interleave MSB-first starting with lon: even interleaved positions
    # (from the MSB) take lon bits, odd take lat bits
    z = F.lit(0).cast("long")
    for k in range(nlon):
        z = z + F.shiftleft(
            F.shiftright(x, nlon - 1 - k).bitwiseAND(F.lit(1)),
            bits - 1 - 2 * k,
        )
    for k in range(nlat):
        z = z + F.shiftleft(
            F.shiftright(y, nlat - 1 - k).bitwiseAND(F.lit(1)),
            bits - 2 - 2 * k,
        )
    chars = [
        F.substring(
            F.lit(ALPHABET),
            (
                F.shiftright(z, bits - 5 * (i + 1)).bitwiseAND(F.lit(31)) + 1
            ).cast("int"),
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def _geohash_sql(lon_expr: str, lat_expr: str, precision: int = PRECISION) -> str:
    """The identical encoder as a DuckDB SQL scalar expression."""
    bits = 5 * precision
    nlon = (bits + 1) // 2
    nlat = bits // 2
    x = f"LEAST(CAST(floor(({lon_expr} + 180.0) / 360.0 * {1 << nlon}) AS BIGINT), {(1 << nlon) - 1})"
    y = f"LEAST(CAST(floor(({lat_expr} + 90.0) / 180.0 * {1 << nlat}) AS BIGINT), {(1 << nlat) - 1})"
    terms = [
        f"((({x} >> {nlon - 1 - k}) & 1) << {bits - 1 - 2 * k})" for k in range(nlon)
    ] + [
        f"((({y} >> {nlat - 1 - k}) & 1) << {bits - 2 - 2 * k})" for k in range(nlat)
    ]
    z = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{ALPHABET}', CAST((({z} >> {bits - 5 * (i + 1)}) & 31) + 1 AS INTEGER), 1)"
        for i in range(precision)
    ]
    return " || ".join(chars)


_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer)
SELECT point_id, {_geohash_sql('lon', 'lat')} AS gh
FROM pts
"""


@register("geohash_encode", _ORACLE)
def geohash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geohash-6 of every customer point — pure-JVM bit interleave,
    generative SQL oracle (exact integer agreement)."""
    from .spatial_queries import _points

    pts = _points(spark, sf_dir)
    return pts.select("point_id", geohash_col(F.col("lon"), F.col("lat")).alias("gh"))


_PREFIX_ORACLE = f"""
WITH pts AS (
  SELECT 10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer)
SELECT substr({_geohash_sql('lon', 'lat')}, 1, 4) AS prefix,
       CAST(COUNT(*) AS BIGINT) AS n
FROM pts GROUP BY prefix
"""


@register("geohash_buckets", _PREFIX_ORACLE)
def geohash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point counts per geohash-4 prefix bucket — the prefix-containment
    partition key in action (map-side combinable groupBy)."""
    from .spatial_queries import _points

    pts = _points(spark, sf_dir)
    gh = geohash_col(F.col("lon"), F.col("lat"))
    return pts.groupBy(F.substring(gh, 1, 4).alias("prefix")).agg(
        F.count(F.lit(1)).alias("n")
    )
