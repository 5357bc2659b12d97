"""Randomized cross-engine agreement for the oracle-critical primitives.

The 15 oracle conversions rest on three claims: md5_60 is engine-identical,
the ray-cast SQL generator reproduces the NumPy PIP kernel, and the zcell
BIGINT packing reproduces cells.cell_of.  The parity suite proves them on
the driver fixtures; this file proves them on RANDOM inputs (seeded), so
agreement is structural, not fixture-coincidence.  The Spark side of each
primitive is either the same NumPy kernel (pandas-UDF paths) or is covered
by the per-query parity tests, so NumPy-vs-DuckDB here closes the chain.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

from data_model_spark.functions import cells, geometry
from data_model_spark.operators.spatial_queries import _raycast_sql

RNG = np.random.default_rng(2026)


class TestMd5_60:
    def test_spark_equals_duckdb_on_random_strings(self, spark):
        from data_model_spark.operators.dedup import MD5_60_SQL, md5_60

        words = [
            "".join(RNG.choice(list("abcXYZ09 _/€ñ"), size=RNG.integers(0, 30)))
            for _ in range(200)
        ]
        sdf = spark.createDataFrame([(w,) for w in words], "s string")
        got = {r.s: r.h for r in sdf.select("s", md5_60("s").alias("h")).collect()}
        con = duckdb.connect()
        con.register("t", pd.DataFrame({"s": words}))
        exp = dict(
            con.execute(
                f"SELECT s, {MD5_60_SQL.format(col='s')} FROM t"
            ).fetchall()
        )
        assert got == exp


class TestRaycastSql:
    def test_matches_numpy_kernel_on_random_polygons(self):
        con = duckdb.connect()
        for trial in range(20):
            n_vert = int(RNG.integers(3, 9))
            poly = RNG.uniform(-5, 5, size=(n_vert, 2))
            px = RNG.uniform(-6, 6, size=500)
            py = RNG.uniform(-6, 6, size=500)
            exp = set(np.nonzero(geometry.points_in_polygon(px, py, poly))[0])
            con.register(
                "pts_src",
                pd.DataFrame({"point_id": np.arange(500), "lon": px, "lat": py}),
            )
            sql = "WITH pts AS (SELECT * FROM pts_src)\n" + _raycast_sql(poly, "p")
            got = {r[0] for r in con.execute(sql).fetchall()}
            assert got == exp, f"trial {trial}: {len(got ^ exp)} diffs"

    def test_horizontal_edges_skipped_consistently(self):
        # rectangle = two horizontal edges the generator must drop as no-ops
        poly = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
        con = duckdb.connect()
        px = np.array([2.0, 5.0, 0.0, 4.0, 2.0])
        py = np.array([1.5, 1.5, 1.5, 1.5, 3.0])
        exp = set(np.nonzero(geometry.points_in_polygon(px, py, poly))[0])
        con.register(
            "pts_src", pd.DataFrame({"point_id": np.arange(5), "lon": px, "lat": py})
        )
        got = {
            r[0]
            for r in con.execute(
                "WITH pts AS (SELECT * FROM pts_src)\n" + _raycast_sql(poly, "p")
            ).fetchall()
        }
        assert got == exp


class TestZcellSql:
    def test_matches_cell_of_on_random_points(self):
        con = duckdb.connect()
        for res in (1, 5, 9, 14):
            lon = RNG.uniform(-180, 180, size=400)
            lat = RNG.uniform(-90, 90, size=400)
            exp = cells.cell_of(lon, lat, res)
            n = 1 << res
            con.register("p", pd.DataFrame({"lon": lon, "lat": lat}))
            got = np.array(
                [
                    r[0]
                    for r in con.execute(
                        f"""
SELECT (CAST({res} AS BIGINT) << 56)
     | (least(greatest(CAST(floor((lat + 90.0) / 180.0 * {n}) AS BIGINT),
                       CAST(0 AS BIGINT)), CAST({n - 1} AS BIGINT)) << 28)
     | least(greatest(CAST(floor((lon + 180.0) / 360.0 * {n}) AS BIGINT),
                      CAST(0 AS BIGINT)), CAST({n - 1} AS BIGINT))
FROM p"""
                    ).fetchall()
                ]
            )
            assert (got == exp).all(), res
