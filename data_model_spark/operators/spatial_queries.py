"""Registered spatial queries over the driver's scalar tables.

Deterministic synthetic geometry derived from table keys (no external
data): customers become points on a lon/lat grid, suppliers become query
points, rectangles/polygons come from fixed literals.

Every query here is SQL-oracle-checked.  The general-polygon PIP oracle
replays the engine's exact even-odd ray-casting edge rule
(functions/geometry.py:points_in_polygon) edge-by-edge in SQL — identical
IEEE-754 double ops, so agreement is bit-exact, not approximate.  The cell
oracle reproduces the int64 zcell packing (functions/cells.py:cell_of) with
BIGINT shifts.  The kNN-via-cells oracle is the exact brute-force ranking:
tests/test_spatial.py proves the k-ring candidate set recovers it exactly
at the registered (res, ring) config.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table, local_df
from .registry import register
from . import spatial, surfaces

def _points(spark, sf_dir, table="customer", key_col="c_custkey"):
    # deterministic point derivation: key -> lon/lat in a 2x2-deg box near 10E/46N
    t = load_table(spark, sf_dir, table).select(F.col(key_col).alias("key"))
    lon = (F.lit(10.0) + (F.pmod(F.col("key") * 37, F.lit(2000)) / 1000.0)).alias("lon")
    lat = (F.lit(46.0) + (F.pmod(F.col("key") * 91, F.lit(2000)) / 1000.0)).alias("lat")
    return t.select(F.col("key").alias("point_id"), lon, lat)


_PIP_RECT_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
rects AS (
  SELECT * FROM (VALUES
    ('r0', 10.2, 46.2, 10.8, 46.8),
    ('r1', 10.5, 46.0, 11.5, 46.5),
    ('r2', 11.0, 47.0, 12.0, 48.0)
  ) AS t(rect_id, xmin, ymin, xmax, ymax))
SELECT r.rect_id, CAST(COUNT(p.point_id) AS BIGINT) AS n_points
FROM rects r LEFT JOIN pts p
  ON p.lon >= r.xmin AND p.lon < r.xmax AND p.lat >= r.ymin AND p.lat < r.ymax
GROUP BY r.rect_id
"""

RECTS = {
    "r0": (10.2, 46.2, 10.8, 46.8),
    "r1": (10.5, 46.0, 11.5, 46.5),
    "r2": (11.0, 47.0, 12.0, 48.0),
}


def _rect_ring(xmin, ymin, xmax, ymax) -> np.ndarray:
    return np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax]])


@register("pip_rect_join", _PIP_RECT_ORACLE)
def pip_rect_join(spark, sf_dir):
    """PIP on axis-aligned rects == range join; counts per rect (with zeros).

    The Spark side runs the *real* polygon engine (broadcast ray-casting
    PIP); the oracle reduces to BETWEEN predicates — exactness of the
    ray-casting half-open edge rule is what makes these agree.
    """
    pts = _points(spark, sf_dir)
    polys = {rid: _rect_ring(*bounds) for rid, bounds in RECTS.items()}
    assigned = spatial.pip_join_broadcast(pts, polys)
    rect_ids = local_df(spark, [(r,) for r in RECTS], "rect_id string")
    counts = assigned.groupBy(F.col("poly_id").alias("rect_id")).agg(
        F.count("*").alias("n_points")
    )
    return (
        rect_ids.join(counts, "rect_id", "left")
        .select("rect_id", F.coalesce("n_points", F.lit(0)).alias("n_points"))
    )


_PIP_POLYS = {
    "tri": np.array([[10.1, 46.1], [11.5, 46.2], [10.3, 47.6]]),
    "ell": np.array(
        [[10.0, 46.0], [11.0, 46.0], [11.0, 46.4], [10.4, 46.4], [10.4, 47.4], [10.0, 47.4]]
    ),
}


def _raycast_sql(poly: np.ndarray, poly_id: str) -> str:
    """Even-odd ray-cast PIP as SQL, mirroring geometry.points_in_polygon.

    One CASE term per non-horizontal edge (horizontal edges never straddle
    the ray, exactly as the NumPy kernel's mask makes them no-ops); the
    crossing test uses the same expression tree — x1 + (py-y1)/(y2-y1)*(x2-x1)
    — so the doubles agree bit-for-bit with the pandas-UDF refine stage.
    """
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = float(poly[i][0]), float(poly[i][1])
        x2, y2 = float(poly[(i + 1) % n][0]), float(poly[(i + 1) % n][1])
        if y1 == y2:
            continue  # cond (y1<=py) != (y2<=py) is identically false
        terms.append(
            f"(CASE WHEN (({y1!r} <= lat) != ({y2!r} <= lat)) AND "
            f"lon < {x1!r} + (lat - {y1!r}) / ({y2!r} - {y1!r}) * ({x2!r} - {x1!r}) "
            f"THEN 1 ELSE 0 END)"
        )
    return (
        f"SELECT point_id, '{poly_id}' AS poly_id FROM pts "
        f"WHERE ({' + '.join(terms)}) % 2 = 1"
    )


_PIP_CELL_ORACLE = (
    """
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer)
"""
    + "\nUNION ALL\n".join(
        _raycast_sql(poly, pid) for pid, poly in _PIP_POLYS.items()
    )
)


@register("pip_cell_join", _PIP_CELL_ORACLE)
def pip_cell_join(spark, sf_dir):
    """Cell-partitioned PIP join (triangle + concave polygon), salted."""
    pts = _points(spark, sf_dir)
    pdf = spatial.polygons_df(spark, _PIP_POLYS)
    return spatial.pip_join_cells(pts, pdf, res=9, salt=4).select(
        "point_id", "poly_id"
    )


_KNN_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
qs AS (
  SELECT s_suppkey AS query_id,
         10.0 + (s_suppkey * 37 % 2000) / 1000.0 AS q_lon,
         46.0 + (s_suppkey * 91 % 2000) / 1000.0 AS q_lat
  FROM supplier WHERE s_suppkey < 4),
scored AS (
  SELECT q.query_id, p.point_id,
         ROUND(2 * 6371008.8 * asin(sqrt(
           least(1.0, pow(sin(radians(p.lat - q.q_lat) / 2), 2)
             + cos(radians(q.q_lat)) * cos(radians(p.lat))
             * pow(sin(radians(p.lon - q.q_lon) / 2), 2)))), 3) AS dist_m
  FROM pts p CROSS JOIN qs q),
ranked AS (
  SELECT query_id, point_id, dist_m,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist_m, point_id) AS rank
  FROM scored)
SELECT query_id, point_id, dist_m, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


@register("knn_bruteforce", _KNN_ORACLE)
def knn_bruteforce(spark, sf_dir):
    """Exact kNN (haversine top-5) — the refinement-correctness oracle."""
    pts = _points(spark, sf_dir)
    qs = _points(spark, sf_dir, "supplier", "s_suppkey").filter(
        F.col("point_id") < 4
    ).withColumnRenamed("point_id", "query_id")
    return spatial.knn_bruteforce(pts, qs, k=5).withColumn(
        "rank", F.col("rank").cast("long")
    )


@register("knn_cells", _KNN_ORACLE)
def knn_cells(spark, sf_dir):
    """kNN via cell k-ring expansion + exact refinement (the scale path).

    Oracle = the brute-force ranking: the (res=7, ring=2) candidate window
    provably contains every true top-5 neighbor for this point density
    (equality asserted in tests/test_spatial.py), so the bucketed path must
    reproduce the exact result — the property that makes it a drop-in for
    the O(N*Q) cross join at 10^12 rows.
    """
    pts = _points(spark, sf_dir)
    qs = _points(spark, sf_dir, "supplier", "s_suppkey").filter(
        F.col("point_id") < 4
    ).withColumnRenamed("point_id", "query_id")
    # grow=2: if the (res=7, ring=2) window ever under-fills a query (point
    # density shifts, k changes), the ring self-heals by doubling instead of
    # surfacing as a spurious oracle mismatch vs the brute-force ranking
    return spatial.knn_join(pts, qs, k=5, res=7, ring=2, grow=2).withColumn(
        "rank", F.col("rank").cast("long")
    )


_CELL_COVER_ORACLE = """
WITH pts AS (
  SELECT c_custkey AS point_id,
         10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
keyed AS (
  SELECT point_id,
         (CAST(9 AS BIGINT) << 56)
         | (least(greatest(CAST(floor((lat + 90.0) / 180.0 * 512) AS BIGINT),
                           CAST(0 AS BIGINT)), CAST(511 AS BIGINT)) << 28)
         | least(greatest(CAST(floor((lon + 180.0) / 360.0 * 512) AS BIGINT),
                          CAST(0 AS BIGINT)), CAST(511 AS BIGINT)) AS cell
  FROM pts)
SELECT cell, CAST(COUNT(*) AS BIGINT) AS n
FROM keyed GROUP BY cell
"""


@register("cell_cover_counts", _CELL_COVER_ORACLE)
def cell_cover_counts(spark, sf_dir):
    """Histogram of points per cell at res 9 — partition-key balance probe.

    The oracle re-derives the int64 zcell packing (functions/cells.py:28:
    ``(res << 56) | (y << 28) | x`` with x/y = clip(trunc(frac * 2^res)))
    in plain BIGINT arithmetic — floor == trunc here because the fractions
    are non-negative.
    """
    pts = _points(spark, sf_dir)
    keyed = spatial.with_point_cell(pts, res=9)
    return keyed.groupBy("cell").agg(F.count("*").alias("n")).orderBy(
        F.col("n").desc(), "cell"
    )


@register("image_validation", None)  # PSNR/caption/phash gate, NumPy-oracled in pytest
def image_validation(spark, sf_dir):
    """input_hint per-row invariant summary by fmt: PSNR>=40dB, captions,
    phash re-derivation — the correctness gate of BASELINE.json."""
    from ..sources.images import generate_images_df
    from .tiling import validate_images

    v = validate_images(generate_images_df(spark, 48))
    return (
        v.groupBy("fmt")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("psnr_db") >= 40, 1).otherwise(0)).alias("n_psnr_ok"),
            F.sum(F.col("caption_ok").cast("int")).alias("n_caption_ok"),
            F.sum(F.col("phash_ok").cast("int")).alias("n_phash_ok"),
        )
        .orderBy("fmt")
    )


@register("tile_point_query", None)  # R4 consumer contract, golden in test_tiling_e2e
def tile_point_query(spark, sf_dir):
    """Partition-pruned point lookup against the merged tile table: the
    filter hits only (level, tile_x, tile_y) keys — no pixel decode."""
    from ..sources.images import generate_images_df
    from . import tiling

    images = generate_images_df(spark, 48)
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, min_dimension=64, repartition=False)
    )
    # a point inside scene 0 (anchor 600000,5090000; 64x64 px at 10 m)
    hits = tiling.point_query(merged, level=0, x=600100.0, y=5090100.0)
    return hits.select("level", "tile_x", "tile_y", "n_sources", "filled_px")


_LAYOUT_ORACLE = """
WITH RECURSIVE lv(level) AS (
  SELECT 0
  UNION ALL
  SELECT level + 1 FROM lv WHERE 5490 // (1 << (level + 1)) >= 256
),
dims AS (
  SELECT level, CAST(5490 // (1 << level) AS INTEGER) AS w,
         CAST(5490 // (1 << level) AS INTEGER) AS h
  FROM lv)
SELECT 'r' || CAST(10 * (1 << level) AS VARCHAR) || 'm' AS asset,
       CASE WHEN level = 0 THEN NULL
            ELSE 'r' || CAST(10 * (1 << (level - 1)) AS VARCHAR) || 'm'
       END AS derived_from,
       CAST(GREATEST(0, CEIL(LOG2(w / 256.0))) AS INTEGER) AS zoom,
       CASE WHEN level = 0 THEN 1.0
            ELSE (5490 // (1 << (level - 1))) / CAST(w AS DOUBLE)
       END AS rel_scale,
       0.0 AS rel_translation,
       h AS shape_h, w AS shape_w,
       (654900.0 - 600000.0) / w AS pixel_dx,
       -(5144900.0 - 5090000.0) / h AS pixel_dy
FROM dims"""


@register("pyramid_layout_meta", _LAYOUT_ORACLE)
def pyramid_layout_meta(spark, sf_dir):
    """Multiscale layout metadata table (minispec `layout` fields): level
    dims, relative scale/translation, absolute affine — R3 as a query.

    The oracle is an independent re-derivation, NOT an echo: a recursive CTE
    replays the COG /2 halving enumeration (gridlib.overview_levels), the
    web-map zoom formula, the parent/child rel-scale ratio and the
    from-bounds affine from the same (5490, min_dim=256, bounds) inputs —
    so the Python gridlib geometry is cross-checked by SQL arithmetic.
    """
    from ..functions import gridlib
    from ..sources.tables import local_df

    bounds = (600000.0, 5090000.0, 654900.0, 5144900.0)
    ovw = gridlib.overview_levels(5490, 5490, min_dimension=256)
    geoms = [
        gridlib.LevelGeom(
            asset=f"r{10 * d['scale_relative']}m",
            width=d["width"],
            height=d["height"],
            resolution_m=10.0 * d["scale_relative"],
            derived_from=None if d["level"] == 0 else f"r{10 * 2 ** (d['level'] - 1)}m",
        )
        for d in ovw
    ]
    layout = gridlib.multiscale_layout(geoms, bounds)
    rows = [
        (
            d["asset"],
            d["derived_from"],
            int(d["zoom"]),
            float(d["transform"]["scale"]),
            float(d["transform"]["translation"]),
            int(d["spatial:shape"][0]),
            int(d["spatial:shape"][1]),
            float(d["spatial:transform"][0]),
            float(d["spatial:transform"][4]),
        )
        for d in layout.levels
    ]
    return local_df(
        spark,
        rows,
        "asset string, derived_from string, zoom int, rel_scale double,"
        " rel_translation double, shape_h int, shape_w int,"
        " pixel_dx double, pixel_dy double",
    )


_COORD_ATTR_ORACLE = """
WITH grid AS (
  SELECT epsg, coord
  FROM (VALUES (4326), (32632), (3857)) AS e(epsg)
  CROSS JOIN (VALUES ('x'), ('y'), ('time'), ('angle'), ('band'),
                     ('detector'), ('scene')) AS c(coord))
SELECT epsg, coord,
  CASE
    WHEN coord = 'x' AND epsg = 4326 THEN 'longitude'
    WHEN coord = 'x' THEN 'projection_x_coordinate'
    WHEN coord = 'y' AND epsg = 4326 THEN 'latitude'
    WHEN coord = 'y' THEN 'projection_y_coordinate'
    WHEN coord IN ('time', 'angle', 'band', 'detector') THEN coord
    ELSE NULL
  END AS standard_name,
  CASE
    WHEN coord = 'x' AND epsg = 4326 THEN 'degrees_east'
    WHEN coord = 'y' AND epsg = 4326 THEN 'degrees_north'
    WHEN coord IN ('x', 'y') THEN 'm'
    ELSE NULL
  END AS units,
  CASE
    WHEN coord = 'x' AND epsg = 4326 THEN 'longitude'
    WHEN coord = 'x' THEN 'x coordinate of projection'
    WHEN coord = 'y' AND epsg = 4326 THEN 'latitude'
    WHEN coord = 'y' THEN 'y coordinate of projection'
    WHEN coord = 'angle' THEN 'angle coordinate'
    WHEN coord = 'band' THEN 'spectral band identifier'
    WHEN coord = 'detector' THEN 'detector identifier'
    ELSE NULL
  END AS long_name,
  coord AS dim
FROM grid"""


@register("coord_attr_templates", _COORD_ATTR_ORACLE)
def coord_attr_templates(spark, sf_dir):
    """Per-CRS coordinate-attribute template generator (F13) as a query.

    One row per (CRS, coordinate) over geographic (4326), UTM (32632) and
    WebMercator (3857) crossed with the coordinate vocabulary incl. an
    unknown name ('scene', dims-only registration).  The Spark side emits
    ``gridlib.coord_attr_template``'s output (reference semantics:
    ``conversion/geozarr.py:1540-1577``, ``1265-1337``); the oracle is an
    independent CASE re-derivation of the dispatch rules in SQL.
    """
    from ..functions import gridlib
    from ..sources.tables import local_df

    rows = []
    for epsg in (4326, 32632, 3857):
        for coord in ("x", "y", "time", "angle", "band", "detector", "scene"):
            t = gridlib.coord_attr_template(coord, epsg)
            rows.append(
                (
                    epsg,
                    coord,
                    t.get("standard_name"),
                    t.get("units"),
                    t.get("long_name"),
                    t["_ARRAY_DIMENSIONS"][0],
                )
            )
    return local_df(
        spark,
        rows,
        "epsg int, coord string, standard_name string, units string,"
        " long_name string, dim string",
    )


def _store_bbox_oracle(n_images: int = 48) -> str:
    """Store-root bbox oracle: the Snyder inverse-TM series replayed in SQL.

    The 48 deterministic scene-footprint corners (sources/images.py:
    footprint_utm — pure functions of the image index) are inlined as VALUES
    rows, and the UTM->WGS84 series of functions/crs.py:utm_to_lonlat is
    written out term-by-term in chained CTEs with the same constants and the
    same evaluation order.  sin/cos/pow may differ from NumPy by an ulp;
    the 1e-9 output rounding absorbs ~1e-14-degree noise with margin.
    """
    from ..functions import crs as c
    from ..sources import images as img

    corners = []
    for i in range(n_images):
        iid = f"img_{i:012d}"
        w, h = img.image_dims(i)
        for x, y in img.footprint_utm(iid, w, h):
            corners.append((i, float(x), float(y)))
    vals = ", ".join(f"({i}, {x!r}, {y!r})" for i, x, y in corners)

    e1 = (1 - (1 - c.E2) ** 0.5) / (1 + (1 - c.E2) ** 0.5)
    co2 = 3 * e1 / 2 - 27 * e1**3 / 32
    co4 = 21 * e1**2 / 16 - 55 * e1**4 / 32
    co6 = 151 * e1**3 / 96
    co8 = 1097 * e1**4 / 512
    am1 = c.A * c._M1
    ae = c.A * (1 - c.E2)
    zone, _north = c.epsg_to_utm_zone(img.SCENE_EPSG)
    cm = c.central_meridian(zone)

    return f"""
WITH corners(scene, x, y) AS (VALUES {vals}),
s1 AS (SELECT scene, x, (y / {c.K0!r}) / {am1!r} AS mu FROM corners),
s2 AS (SELECT *, mu + {co2!r} * sin(2 * mu) + {co4!r} * sin(4 * mu)
                 + {co6!r} * sin(6 * mu) + {co8!r} * sin(8 * mu) AS phi1 FROM s1),
s3 AS (SELECT *, sin(phi1) AS sp, cos(phi1) AS cp, tan(phi1) AS tp FROM s2),
s4 AS (SELECT *, {c.EP2!r} * power(cp, 2) AS c1, power(tp, 2) AS t1,
               {c.A!r} / sqrt(1 - {c.E2!r} * power(sp, 2)) AS n1,
               {ae!r} / power(1 - {c.E2!r} * power(sp, 2), 1.5) AS r1 FROM s3),
s5 AS (SELECT *, (x - {c.FALSE_EASTING!r}) / (n1 * {c.K0!r}) AS d FROM s4),
s6 AS (SELECT scene,
    degrees(phi1 - (n1 * tp / r1) * (power(d, 2) / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * power(c1, 2) - 9 * {c.EP2!r})
          * power(d, 4) / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * power(t1, 2) - 252 * {c.EP2!r}
           - 3 * power(c1, 2)) * power(d, 6) / 720)) AS lat,
    {cm!r} + degrees((d - (1 + 2 * t1 + c1) * power(d, 3) / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * power(c1, 2) + 8 * {c.EP2!r}
           + 24 * power(t1, 2)) * power(d, 5) / 120) / cp) AS lon
  FROM s5)
SELECT ROUND(MIN(lon), 9) AS xmin, ROUND(MIN(lat), 9) AS ymin,
       ROUND(MAX(lon), 9) AS xmax, ROUND(MAX(lat), 9) AS ymax,
       CAST(COUNT(DISTINCT scene) AS BIGINT) AS n_scenes
FROM s6"""


@register("store_root_bbox", _store_bbox_oracle(48))
def store_root_bbox(spark, sf_dir):
    """Store-root bbox: every scene footprint reprojected to EPSG:4326 in a
    vectorized pandas UDF, then one global min/max union aggregation
    (`s2_converter.py:321-363`)."""
    import pandas as pd

    from ..functions import crs
    from ..sources import images as img_src
    from ..sources.images import generate_images_df

    imgs = generate_images_df(spark, 48).select("image_id", "w", "h")

    def bbox4326(batches):
        zone, north = crs.epsg_to_utm_zone(img_src.SCENE_EPSG)
        for pdf in batches:
            recs = []
            for iid, ww, hh in zip(pdf["image_id"], pdf["w"], pdf["h"]):
                ring = img_src.footprint_utm(iid, int(ww), int(hh))
                lon, lat = crs.utm_to_lonlat(ring[:, 0], ring[:, 1], zone, north)
                recs.append((lon.min(), lat.min(), lon.max(), lat.max()))
            yield pd.DataFrame(recs, columns=["xmin", "ymin", "xmax", "ymax"])

    b = imgs.mapInPandas(
        bbox4326, "xmin double, ymin double, xmax double, ymax double"
    )
    return b.agg(
        F.round(F.min("xmin"), 9).alias("xmin"),
        F.round(F.min("ymin"), 9).alias("ymin"),
        F.round(F.max("xmax"), 9).alias("xmax"),
        F.round(F.max("ymax"), 9).alias("ymax"),
        F.count("*").alias("n_scenes"),
    )


_COMPACT_RES = 13
_COMPACT_MIN_RES = 9


def _compact_oracle() -> str:
    """Closed-form compaction oracle — NOT a replay of the iterative merge.

    A cell at res r belongs to the compacted cover of an axis-aligned cell
    range [x0..x1]x[y0..y1] (at res 13) iff its res-13 descendant block is
    fully inside the range AND its parent's block is not (at min_res the
    parent condition is dropped: compaction stops there).  The engine runs
    the bottom-up groupBy/anti-join merge; the oracle derives membership
    directly from interval containment — two independent formulations that
    must agree exactly.
    """
    vals = ", ".join(
        f"('{rid}', {xmin!r}, {ymin!r}, {xmax!r}, {ymax!r})"
        for rid, (xmin, ymin, xmax, ymax) in sorted(RECTS.items())
    )
    n = 1 << _COMPACT_RES
    return f"""
WITH rects(rect_id, xmin, ymin, xmax, ymax) AS (VALUES {vals}),
rng AS (SELECT rect_id,
  least(greatest(CAST(floor((xmin + 180.0) / 360.0 * {n}) AS BIGINT),
                 CAST(0 AS BIGINT)), CAST({n - 1} AS BIGINT)) AS x0,
  least(greatest(CAST(floor((xmax + 180.0) / 360.0 * {n}) AS BIGINT),
                 CAST(0 AS BIGINT)), CAST({n - 1} AS BIGINT)) AS x1,
  least(greatest(CAST(floor((ymin + 90.0) / 180.0 * {n}) AS BIGINT),
                 CAST(0 AS BIGINT)), CAST({n - 1} AS BIGINT)) AS y0,
  least(greatest(CAST(floor((ymax + 90.0) / 180.0 * {n}) AS BIGINT),
                 CAST(0 AS BIGINT)), CAST({n - 1} AS BIGINT)) AS y1
 FROM rects),
lv AS (SELECT rng.*, CAST(r AS BIGINT) AS r,
              CAST({_COMPACT_RES} - r AS BIGINT) AS s
       FROM rng, (VALUES {", ".join(f"({r})" for r in range(_COMPACT_MIN_RES, _COMPACT_RES + 1))}) l(r)),
cx AS (SELECT *, unnest(range(x0 >> s, (x1 >> s) + 1)) AS px FROM lv),
cxy AS (SELECT *, unnest(range(y0 >> s, (y1 >> s) + 1)) AS py FROM cx)
SELECT rect_id, ((r << 56) | (py << 28) | px) AS cell, CAST(r AS INT) AS res
FROM cxy
WHERE (px << s) >= x0 AND (((px + 1) << s) - 1) <= x1
  AND (py << s) >= y0 AND (((py + 1) << s) - 1) <= y1
  AND NOT (CASE WHEN r = {_COMPACT_MIN_RES} THEN FALSE ELSE
       ((px >> 1) << (s + 1)) >= x0 AND ((((px >> 1) + 1) << (s + 1)) - 1) <= x1
   AND ((py >> 1) << (s + 1)) >= y0 AND ((((py >> 1) + 1) << (s + 1)) - 1) <= y1
  END)"""


@register("cell_compact", _compact_oracle)
def cell_compact(spark, sf_dir):
    """Hierarchical cover compaction (H3 ``compact``) over the RECTS covers.

    Covers explode distributed (sequence ranges from the engine's own
    ``cells.bbox_cover`` arithmetic), then ``spatial.compact_cover_df``
    runs the bottom-up quad merge res 13 -> 9.  At footprint scale this is
    what keeps exploded cover tables broadcast-able (interior collapses,
    only the perimeter stays fine-grained).
    """
    from ..functions import cells as cl

    rows = []
    for rid, (xmin, ymin, xmax, ymax) in sorted(RECTS.items()):
        cover = cl.bbox_cover(xmin, ymin, xmax, ymax, _COMPACT_RES)
        xs, ys = cl.cell_xy(cover)
        rows.append((rid, int(xs.min()), int(xs.max()), int(ys.min()), int(ys.max())))
    base = local_df(spark, rows, "rect_id string, x0 long, x1 long, y0 long, y1 long")
    covers = (
        base.withColumn("x", F.explode(F.sequence("x0", "x1")))
        .withColumn("y", F.explode(F.sequence("y0", "y1")))
        .select(
            "rect_id",
            spatial._pack_cell(_COMPACT_RES, F.col("x"), F.col("y")).alias("cell"),
        )
    )
    out = spatial.compact_cover_df(
        covers, res=_COMPACT_RES, min_res=_COMPACT_MIN_RES, id_col="rect_id"
    )
    return out.select(
        "rect_id", "cell", F.shiftright("cell", 56).cast("int").alias("res")
    )


_MASK_RES = 11
_MASK_N = 1 << _MASK_RES

_MASK_BOUNDARY_ORACLE = f"""
WITH pts AS (
  SELECT 10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
mask AS (
  SELECT DISTINCT
         (CAST({_MASK_RES} AS BIGINT) << 56)
         | (least(greatest(CAST(floor((lat + 90.0) / 180.0 * {_MASK_N}) AS BIGINT),
                           CAST(0 AS BIGINT)), CAST({_MASK_N - 1} AS BIGINT)) << 28)
         | least(greatest(CAST(floor((lon + 180.0) / 360.0 * {_MASK_N}) AS BIGINT),
                          CAST(0 AS BIGINT)), CAST({_MASK_N - 1} AS BIGINT)) AS cell
  FROM pts),
xy AS (SELECT cell, cell & 268435455 AS x, (cell >> 28) & 268435455 AS y FROM mask)
SELECT m.cell, m.x, m.y FROM xy m
WHERE NOT EXISTS (SELECT 1 FROM xy n WHERE n.x = (m.x + 1) % {_MASK_N} AND n.y = m.y)
   OR NOT EXISTS (SELECT 1 FROM xy n WHERE n.x = (m.x + {_MASK_N - 1}) % {_MASK_N} AND n.y = m.y)
   OR m.y + 1 >= {_MASK_N}
   OR NOT EXISTS (SELECT 1 FROM xy n WHERE n.x = m.x AND n.y = m.y + 1)
   OR m.y - 1 < 0
   OR NOT EXISTS (SELECT 1 FROM xy n WHERE n.x = m.x AND n.y = m.y - 1)
"""


@register("mask_boundary_cells", _MASK_BOUNDARY_ORACLE)
def mask_boundary_cells(spark, sf_dir):
    """Boundary of the customer-point cell mask at res 11 (raster -> vector).

    The engine runs the neighbor-explode / self-join / anti-join pipeline
    (spatial.mask_boundary_cells); the oracle decides boundary membership
    with four NOT EXISTS probes — different formulation, same rook rule.
    The key-derived point lattice leaves holes in the mask, so the result
    exercises interior hole edges, not just the outer perimeter.
    """
    pts = _points(spark, sf_dir)
    keyed = spatial.with_point_cell(pts, res=_MASK_RES)
    return spatial.mask_boundary_cells(keyed.select("cell"), res=_MASK_RES)


_DIRTY_N_SCENES = 96

_DIRTY_ORACLE = f"""
WITH chg AS (SELECT i FROM range(0, {_DIRTY_N_SCENES}) t(i) WHERE i % 7 = 0),
dims AS (SELECT i,
  CAST(CASE i % 3 WHEN 0 THEN 64 WHEN 1 THEN 256 ELSE 512 END AS BIGINT) AS w,
  CAST(CASE (i // 3) % 3 WHEN 0 THEN 64 WHEN 1 THEN 256 ELSE 512 END AS BIGINT) AS h,
  600000 + (i % 64) * 2560 AS ax,
  5090000 + (i // 64) * 2560 AS ay
 FROM chg),
lv AS (SELECT dims.*, CAST(l AS BIGINT) AS level
       FROM dims, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) t(l)
       WHERE (least(w, h) >> CAST(l AS BIGINT)) >= 64),
tm AS (SELECT *, (CAST(2560 AS BIGINT) << level) AS tsz FROM lv),
tx AS (SELECT *, unnest(range(ax // tsz, (ax + w * 10 - 1) // tsz + 1)) AS tile_x FROM tm),
txy AS (SELECT *, unnest(range(ay // tsz, (ay + h * 10 - 1) // tsz + 1)) AS tile_y FROM tx)
SELECT CAST(level AS INT) AS level, tile_x, tile_y,
       CAST(COUNT(DISTINCT i) AS BIGINT) AS n_scenes
FROM txy GROUP BY 1, 2, 3
"""


@register("pyramid_dirty_tiles", _DIRTY_ORACLE)
def pyramid_dirty_tiles(spark, sf_dir):
    """Incremental-update work list: tiles touched by changed scenes.

    Every 7th scene of a 96-scene grid is "reprocessed"; the engine turns
    metadata rows alone into the exact (level, tile_x, tile_y) rewrite set
    (tiling.dirty_tiles — integer JVM arithmetic, no decode).  The oracle
    re-derives scene dims/anchors from the index cycles and replays the
    range arithmetic in SQL.  tests/test_incremental.py proves the key set
    equals the distinct tile keys of a full build_tiles run on the same
    scenes — metadata planning == pixel-path truth.
    """
    from ..sources.images import generate_images_meta_df
    from . import tiling

    meta = generate_images_meta_df(spark, _DIRTY_N_SCENES)
    changed = meta.filter(
        F.pmod(F.split("image_id", "_").getItem(1).cast("long"), F.lit(7)) == 0
    )
    return tiling.dirty_tiles(changed)


_TRAJ_RES = 14
_TRAJ_N = 1 << _TRAJ_RES

_TRAJ_ORACLE = f"""
WITH d AS (
  SELECT event_id, ts, user_id,
         (event_id * 37 % 21) - 10 AS dlon,
         (event_id * 91 % 21) - 10 AS dlat
  FROM events),
pos AS (
  SELECT user_id, ts, event_id,
         SUM(dlon) OVER w AS lon_m, SUM(dlat) OVER w AS lat_m
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)),
pt AS (
  SELECT user_id, ts, event_id,
         10.0 + lon_m / 1000.0 AS lon, 46.0 + lat_m / 1000.0 AS lat
  FROM pos),
seg AS (
  SELECT user_id,
         LAG(lon) OVER w AS lon0, LAG(lat) OVER w AS lat0,
         lon AS lon1, lat AS lat1
  FROM pt
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (
  SELECT user_id,
         (lon0 + 180.0) / 360.0 * {_TRAJ_N} AS gx0,
         (lat0 + 90.0) / 180.0 * {_TRAJ_N} AS gy0,
         (lon1 + 180.0) / 360.0 * {_TRAJ_N} AS gx1,
         (lat1 + 90.0) / 180.0 * {_TRAJ_N} AS gy1
  FROM seg WHERE lon0 IS NOT NULL),
cx AS (
  SELECT *, unnest(range(CAST(floor(least(gx0, gx1)) AS BIGINT),
                         CAST(floor(greatest(gx0, gx1)) AS BIGINT) + 1)) AS cell_x
  FROM g),
cxy AS (
  SELECT *, unnest(range(CAST(floor(least(gy0, gy1)) AS BIGINT),
                         CAST(floor(greatest(gy0, gy1)) AS BIGINT) + 1)) AS cell_y
  FROM cx),
k AS (
  SELECT user_id, cell_x, cell_y,
         (gx1 - gx0) * (CAST(cell_y AS DOUBLE) - gy0)
           - (gy1 - gy0) * (CAST(cell_x AS DOUBLE) - gx0) AS c00,
         (gx1 - gx0) * (CAST(cell_y AS DOUBLE) - gy0)
           - (gy1 - gy0) * ((CAST(cell_x AS DOUBLE) + 1.0) - gx0) AS c10,
         (gx1 - gx0) * ((CAST(cell_y AS DOUBLE) + 1.0) - gy0)
           - (gy1 - gy0) * (CAST(cell_x AS DOUBLE) - gx0) AS c01,
         (gx1 - gx0) * ((CAST(cell_y AS DOUBLE) + 1.0) - gy0)
           - (gy1 - gy0) * ((CAST(cell_x AS DOUBLE) + 1.0) - gx0) AS c11
  FROM cxy)
SELECT (CAST({_TRAJ_RES} AS BIGINT) << 56) | (cell_y << 28) | cell_x AS cell,
       cell_x, cell_y,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(COUNT(*) AS BIGINT) AS n_segments
FROM k
WHERE least(c00, c10, c01, c11) <= 0 AND greatest(c00, c10, c01, c11) >= 0
GROUP BY 1, 2, 3
"""


@register("trajectory_cell_cover", _TRAJ_ORACLE)
def trajectory_cell_cover(spark, sf_dir):
    """Trajectory rasterization: cells crossed by per-user random walks.

    Events become per-user walks (integer milli-degree steps cumulated in
    event-time order — exact int window sums on both engines), consecutive
    fixes become segments, and ``spatial.segment_cover_cells`` rasterizes
    each segment to its exact conservative cell cover (bbox explode +
    4-corner straddle test, all JVM).  The oracle replays the identical
    IEEE-754 double formulas in SQL, so agreement is bit-level, and the
    result aggregates per cell (distinct users + segment hits) — the
    vector->raster half of the R5 raster<->vector pair, on linear features
    instead of polygons.
    """
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    d = ev.withColumn(
        "dlon", F.pmod(F.col("event_id") * 37, F.lit(21)) - 10
    ).withColumn("dlat", F.pmod(F.col("event_id") * 91, F.lit(21)) - 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = (
        d.withColumn("lon_m", F.sum("dlon").over(w))
        .withColumn("lat_m", F.sum("dlat").over(w))
        .withColumn("lon1", 10.0 + F.col("lon_m") / 1000.0)
        .withColumn("lat1", 46.0 + F.col("lat_m") / 1000.0)
    )
    seg = (
        pos.withColumn("lon0", F.lag("lon1").over(w))
        .withColumn("lat0", F.lag("lat1").over(w))
        .filter(F.col("lon0").isNotNull())
        .select("user_id", "lon0", "lat0", "lon1", "lat1")
    )
    cov = spatial.segment_cover_cells(seg, res=_TRAJ_RES)
    return cov.groupBy("cell", "cell_x", "cell_y").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_segments"),
    )


_IDW_RES = 13
_IDW_N = 1 << _IDW_RES
_IDW_BOX = RECTS["r0"]


def _idw_oracle() -> str:
    xmin, ymin, xmax, ymax = _IDW_BOX
    tx0 = int((xmin + 180.0) / 360.0 * _IDW_N)
    tx1 = int((xmax + 180.0) / 360.0 * _IDW_N)
    ty0 = int((ymin + 90.0) / 180.0 * _IDW_N)
    ty1 = int((ymax + 90.0) / 180.0 * _IDW_N)
    return f"""
WITH pts AS (
  SELECT 10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat,
         (c_custkey * 53 % 1000) / 10.0 AS value
  FROM customer),
px AS (
  SELECT *, CAST(floor((lon + 180.0) / 360.0 * {_IDW_N}) AS BIGINT) AS cx,
            CAST(floor((lat + 90.0) / 180.0 * {_IDW_N}) AS BIGINT) AS cy
  FROM pts),
t AS (
  SELECT tx, unnest(range({ty0}, {ty1} + 1)) AS ty
  FROM (SELECT unnest(range({tx0}, {tx1} + 1)) AS tx)),
j AS (
  SELECT t.tx, t.ty, p.value,
         (p.lon - ((t.tx + 0.5) / {_IDW_N} * 360.0 - 180.0))
           * (p.lon - ((t.tx + 0.5) / {_IDW_N} * 360.0 - 180.0))
         + (p.lat - ((t.ty + 0.5) / {_IDW_N} * 180.0 - 90.0))
           * (p.lat - ((t.ty + 0.5) / {_IDW_N} * 180.0 - 90.0)) AS d2
  FROM t JOIN px p
    ON abs(p.cx - t.tx) <= 1 AND abs(p.cy - t.ty) <= 1)
SELECT tx, ty,
       SUM((1.0 / (d2 + 1e-6)) * value) / SUM(1.0 / (d2 + 1e-6)) AS idw_value,
       CAST(COUNT(*) AS BIGINT) AS n_pts
FROM j GROUP BY tx, ty
"""


@register("idw_surface", _idw_oracle)
def idw_surface(spark, sf_dir):
    """IDW interpolation of customer-point values onto the r0 grid window.

    The scatter->grid move (GCP-grid style interpolation, reference
    ``conversion/geozarr.py`` GCP handling) as a bucketed join: points key
    by containing cell (JVM floor arithmetic), each of the ~420 target
    cells explodes its 3x3 ring keys, and the equi-join on the int64 cell
    id bounds the neighborhood — no cross join at any scale.  The oracle
    expresses the same neighborhood as an |dx|<=1, |dy|<=1 join (the
    ring-explode's relational complement, exercised far from the
    antimeridian where the two agree) and the same 1/(d2+eps) weights.
    """
    pts = _points(spark, sf_dir).withColumn(
        "value", F.pmod(F.col("point_id") * 53, F.lit(1000)) / 10.0
    )
    targets = surfaces.grid_window(spark, _IDW_RES, *_IDW_BOX)
    return surfaces.idw_grid(pts, targets, res=_IDW_RES, ring=1)


_KDE_H = 0.02  # Epanechnikov bandwidth, degrees (< the res-13 cell height)


def _kde_oracle() -> str:
    xmin, ymin, xmax, ymax = _IDW_BOX
    tx0 = int((xmin + 180.0) / 360.0 * _IDW_N)
    tx1 = int((xmax + 180.0) / 360.0 * _IDW_N)
    ty0 = int((ymin + 90.0) / 180.0 * _IDW_N)
    ty1 = int((ymax + 90.0) / 180.0 * _IDW_N)
    h2 = _KDE_H * _KDE_H
    return f"""
WITH pts AS (
  SELECT 10.0 + (c_custkey * 37 % 2000) / 1000.0 AS lon,
         46.0 + (c_custkey * 91 % 2000) / 1000.0 AS lat
  FROM customer),
px AS (
  SELECT *, CAST(floor((lon + 180.0) / 360.0 * {_IDW_N}) AS BIGINT) AS cx,
            CAST(floor((lat + 90.0) / 180.0 * {_IDW_N}) AS BIGINT) AS cy
  FROM pts),
t AS (
  SELECT tx, unnest(range({ty0}, {ty1} + 1)) AS ty
  FROM (SELECT unnest(range({tx0}, {tx1} + 1)) AS tx)),
j AS (
  SELECT t.tx, t.ty,
         (p.lon - ((t.tx + 0.5) / {_IDW_N} * 360.0 - 180.0))
           * (p.lon - ((t.tx + 0.5) / {_IDW_N} * 360.0 - 180.0))
         + (p.lat - ((t.ty + 0.5) / {_IDW_N} * 180.0 - 90.0))
           * (p.lat - ((t.ty + 0.5) / {_IDW_N} * 180.0 - 90.0)) AS d2
  FROM t JOIN px p
    ON abs(p.cx - t.tx) <= 1 AND abs(p.cy - t.ty) <= 1)
SELECT tx, ty, CAST(COUNT(*) AS BIGINT) AS n_pts,
       CAST(SUM(CAST(FLOOR(GREATEST(0.0, 1.0 - d2 / {h2!r}) * 1e6 + 0.5)
                AS BIGINT)) AS BIGINT) AS dens_q
FROM j GROUP BY tx, ty
"""


@register("kde_surface", _kde_oracle)
def kde_surface(spark, sf_dir):
    """Epanechnikov kernel-density heatmap of the customer points over
    the r0 grid window — ``surfaces.kde_grid``'s bucketed ring join with
    per-point contributions quantized to int64 micro-units BEFORE the
    sum, so the aggregate is order-independent and the generative SQL
    oracle matches hash-exact (no float tolerance, no transcendentals).
    """
    pts = _points(spark, sf_dir)
    targets = surfaces.grid_window(spark, _IDW_RES, *_IDW_BOX)
    return surfaces.kde_grid(pts, targets, res=_IDW_RES, bandwidth=_KDE_H, ring=1)


# tile-grid boundaries are 2560-multiples; za is one exact tile (interior
# path), zb sits inside a tile, zc mixes interior + boundary, zd is a
# boundary-only strip further east
_ZONES = {
    "za": (234 * 2560, 1988 * 2560, 235 * 2560, 1989 * 2560),
    "zb": (600130, 5090070, 601000, 5090550),
    "zc": (600640, 5090320, 608960, 5094500),
    "zd": (612800, 5090000, 625600, 5092560),
}


@register("zonal_stats", None)  # pixel path; exactness in tests/test_zonal.py
def zonal_stats(spark, sf_dir):
    """Per-(zone, var) pixel stats over the merged tile raster.

    Interior tiles contribute their precomputed canvas aggregates as pure
    column arithmetic (no decode); only zone-edge tiles enter the Arrow
    clip stage — the split that makes 100 TB zonal stats mostly a metadata
    scan.  tests/test_zonal.py proves the two-path result equals a NumPy
    clip of every tile, with both paths exercised.
    """
    from ..sources.images import generate_images_df
    from . import tiling, zonal

    images = generate_images_df(spark, 48)
    merged = tiling.merge_tiles(tiling.build_tiles(images, repartition=False))
    zones = zonal.zones_df(spark, _ZONES)
    out = zonal.zonal_stats(merged, zones, level=0)
    return out.select(
        "zone_id", "var", "n_px", "px_sum", F.round("px_mean", 6).alias("px_mean")
    )


@register("zonal_stats_poly", None)  # pixel path; tests/test_zonal_poly.py
def zonal_stats_poly_q(spark, sf_dir):
    """Polygon zonal statistics: arbitrary simple polygons (convex and
    concave) over the merged tile raster.

    Interior tiles (exact classification: corners-in + no-vertex-in +
    no-edge-cross) aggregate from canvas metadata with no decode; boundary
    tiles decode once and mask pixel centers with a vectorized even-odd
    ray cast.  tests/test_zonal_poly.py proves equality with a pure
    per-pixel evaluation over every tile, with both paths exercised and a
    reflex-corner tile pinned to the decode path.
    """
    import numpy as np

    from ..sources.images import generate_images_df
    from . import tiling, zonal

    images = generate_images_df(spark, 48)
    merged = tiling.merge_tiles(tiling.build_tiles(images, repartition=False))
    polys = {
        "tri": np.array(
            [[601000, 5089000], [640000, 5089000], [620000, 5096000]], dtype=float
        ),
        "ell": np.array(
            [
                [660000, 5089500], [680000, 5089500], [680000, 5092000],
                [670000, 5092000], [670000, 5094500], [660000, 5094500],
            ],
            dtype=float,
        ),
    }
    out = zonal.zonal_stats_poly(merged, polys, level=0)
    return out.select(
        "zone_id", "var", "n_px", "px_sum", F.round("px_mean", 6).alias("px_mean")
    )


def _zonal_fp_oracle() -> str:
    """Direct-kernel VALUES replay of ``zonal_stats`` (the otsu_mosaic
    pattern, VERDICT r4 #5): regenerate the 48 codec-roundtripped scenes,
    place them into per-(var, tile) canvases with plain floor arithmetic
    (level 0 only, no engine cut code), then clip every zone window
    against every EXISTING canvas — canvas semantics, so zone pixels over
    unfilled canvas areas count toward n_px exactly as the engine's
    metadata fast path counts them.  All sums are integer-valued doubles
    (< 2^53), so px_sum and px_mean = px_sum/n_px are IEEE-identical
    across engines regardless of accumulation order."""
    from .replay import merged_canvases

    TILE_PX, PX_M = 256, 10
    tile_m = TILE_PX * PX_M
    canvases = merged_canvases(48)
    acc: dict[tuple, tuple[int, float]] = {}
    for (var, tx, ty), cv in canvases.items():
        for zid, (x0, y0, x1, y1) in _ZONES.items():
            if x1 <= x0 or y1 <= y0:
                continue
            c0 = max(0, -((-(x0 - tx * tile_m)) // PX_M))
            c1 = min(TILE_PX, (x1 - tx * tile_m) // PX_M)
            r0 = max(0, -((-((ty + 1) * tile_m - y1)) // PX_M))
            r1 = min(TILE_PX, ((ty + 1) * tile_m - y0) // PX_M)
            if c1 <= c0 or r1 <= r0:
                continue
            blk = cv[r0:r1, c0:c1].astype(np.float64)
            n, s = acc.get((zid, var), (0, 0.0))
            acc[(zid, var)] = (n + blk.size, s + float(blk.sum()))
    vals = ", ".join(
        f"('{z}', '{v}', {n}, {s!r})" for (z, v), (n, s) in sorted(acc.items())
    )
    return f"""
WITH v(zone_id, var, n_px, px_sum) AS (VALUES {vals})
SELECT zone_id, var, CAST(n_px AS BIGINT) AS n_px,
       CAST(px_sum AS DOUBLE) AS px_sum,
       ROUND(px_sum / n_px, 6) AS px_mean
FROM v"""


@register("zonal_stats_fp", _zonal_fp_oracle)
def zonal_stats_fp(spark, sf_dir):
    """``zonal_stats``'s oracle twin: same distributed two-path plan,
    hash-checked against the direct-kernel replay above — the driver-
    visible upgrade of the tests/test_zonal.py pixel-equality pin."""
    return zonal_stats(spark, sf_dir)


@register("focal_mean", None)  # pixel path; exactness in tests/test_focal.py
def focal_mean(spark, sf_dir):
    """3x3 focal mean over the merged tile raster via halo exchange.

    Each tile ships only its 1-px edge strips to its 8 neighbors (one
    shuffle, ~3% volume overhead over the canvases themselves), the
    assembly stage convolves the padded canvas with exact integer window
    sums, and tests/test_focal.py proves every tile equals the NumPy
    convolution of the zero-padded global mosaic — interior borders
    included.  Returned here: per-tile focal summaries (the driver's
    rows-only check), canvases dropped.
    """
    from ..sources.images import generate_images_df
    from . import focal, tiling

    images = generate_images_df(spark, 48)
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter(F.col("level") == 0)
    out = focal.focal_stats(merged, radius=1)
    return out.select(
        "var", "tile_x", "tile_y", "n_halo",
        F.round("focal_sum", 3).alias("focal_sum"),
        F.round("focal_min", 3).alias("focal_min"),
        F.round("focal_max", 3).alias("focal_max"),
    )


@register("tile_bbox_query", None)  # R4 bbox crop, golden vs direct geometry
def tile_bbox_query(spark, sf_dir):
    """Range-filtered bbox crop over the merged tile table: only tile keys
    are touched (partition pruning on a range-partitioned write)."""
    from ..sources.images import generate_images_df
    from . import tiling

    images = generate_images_df(spark, 48)
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, min_dimension=64, repartition=False)
    )
    crop = tiling.bbox_query(
        merged, level=0, x0=600000.0, y0=5090000.0, x1=605120.0, y1=5092560.0
    )
    return crop.groupBy("level").agg(
        F.count("*").alias("n_tiles"),
        F.min("tile_x").alias("tx_min"),
        F.max("tile_x").alias("tx_max"),
        F.min("tile_y").alias("ty_min"),
        F.max("tile_y").alias("ty_max"),
    )


# ---------------------------------------------------------------------------
# polygon-polygon overlay join (R16)
# ---------------------------------------------------------------------------

# literal zone polygons; coordinates deliberately off the rect field's
# 1/1000-degree lattice so no fixture pair sits exactly on a boundary
_OVERLAY_POLYS = {
    "tri": np.array([[10.1237, 46.2119], [11.4411, 46.0913], [10.5672, 47.3318]]),
    "ell": np.array(
        [
            [10.9114, 46.5217], [11.8561, 46.5217], [11.8561, 47.6119],
            [11.4017, 47.6119], [11.4017, 46.9321], [10.9114, 46.9321],
        ]
    ),
    "sliv": np.array([[10.0513, 47.7011], [11.9513, 47.8213], [10.0523, 47.7321]]),
    "quad": np.array(
        [[11.2519, 46.0417], [11.9911, 46.2218], [11.7513, 46.8816], [11.1817, 46.7219]]
    ),
}


def _pp_raycast_odd(poly: np.ndarray, px: str, py: str) -> str:
    """Even-odd ray-cast parity for an SQL point against a literal ring —
    the same per-edge expression tree as geometry.points_in_polygon (see
    _raycast_sql), but with the point coordinates as SQL expressions."""
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = float(poly[i][0]), float(poly[i][1])
        x2, y2 = float(poly[(i + 1) % n][0]), float(poly[(i + 1) % n][1])
        if y1 == y2:
            continue
        terms.append(
            f"(CASE WHEN (({y1!r} <= {py}) != ({y2!r} <= {py})) AND "
            f"{px} < {x1!r} + ({py} - {y1!r}) / ({y2!r} - {y1!r}) * ({x2!r} - {x1!r}) "
            f"THEN 1 ELSE 0 END)"
        )
    return f"(({' + '.join(terms)}) % 2 = 1)"


def _pp_intersects_sql(poly: np.ndarray, pid: str) -> str:
    """polygons_intersect(poly, rect) replayed in SQL for key-derived rects.

    Mirrors geometry.polygons_intersect term by term: (1) any rect corner
    inside the literal ring (ray cast, identical expression tree), (2) any
    literal vertex inside the rect — for an axis-aligned ring the engine's
    even-odd cast reduces EXACTLY (the vertical-edge x-intercept is the
    edge x: the (py-y1)/(y2-y1)*(x2-x1) term is a finite multiple of 0.0)
    to xmin <= vx < xmax AND ymin <= vy < ymax, (3) any proper edge
    crossing via the same sign-product test as _segments_cross.
    """
    corners = [("xmin", "ymin"), ("xmax", "ymin"), ("xmax", "ymax"), ("xmin", "ymax")]
    corner_in = " OR ".join(_pp_raycast_odd(poly, cx, cy) for cx, cy in corners)
    vert_in = " OR ".join(
        f"({vx!r} >= xmin AND {vx!r} < xmax AND {vy!r} >= ymin AND {vy!r} < ymax)"
        for vx, vy in ((float(v[0]), float(v[1])) for v in poly)
    )
    # rect edges in ring order (corner i -> corner i+1), as (x1,y1,x2,y2)
    rect_edges = [
        ("xmin", "ymin", "xmax", "ymin"),
        ("xmax", "ymin", "xmax", "ymax"),
        ("xmax", "ymax", "xmin", "ymax"),
        ("xmin", "ymax", "xmin", "ymin"),
    ]
    cross_terms = []
    n = len(poly)
    for i in range(n):
        ax1, ay1 = float(poly[i][0]), float(poly[i][1])
        ax2, ay2 = float(poly[(i + 1) % n][0]), float(poly[(i + 1) % n][1])
        dax, day = ax2 - ax1, ay2 - ay1  # constant-folded like NumPy doubles
        for bx1, by1, bx2, by2 in rect_edges:
            d1 = f"SIGN({dax!r} * ({by1} - {ay1!r}) - {day!r} * ({bx1} - {ax1!r}))"
            d2 = f"SIGN({dax!r} * ({by2} - {ay1!r}) - {day!r} * ({bx2} - {ax1!r}))"
            d3 = (
                f"SIGN(({bx2} - {bx1}) * ({ay1!r} - {by1}) "
                f"- ({by2} - {by1}) * ({ax1!r} - {bx1}))"
            )
            d4 = (
                f"SIGN(({bx2} - {bx1}) * ({ay2!r} - {by1}) "
                f"- ({by2} - {by1}) * ({ax2!r} - {bx1}))"
            )
            cross_terms.append(f"(({d1}) * ({d2}) < 0 AND ({d3}) * ({d4}) < 0)")
    pred = f"({corner_in}) OR ({vert_in}) OR ({' OR '.join(cross_terms)})"
    return f"SELECT '{pid}' AS a_id, b_id FROM rects WHERE {pred}"


def _overlay_oracle() -> str:
    rects = """
WITH rects AS (
  SELECT 's' || CAST(s_suppkey AS VARCHAR) AS b_id,
         10.0 + (s_suppkey * 53 % 1900) / 1000.0 AS xmin,
         46.0 + (s_suppkey * 29 % 1900) / 1000.0 AS ymin,
         (10.0 + (s_suppkey * 53 % 1900) / 1000.0)
           + (0.05 + (s_suppkey % 7) * 0.03) AS xmax,
         (46.0 + (s_suppkey * 29 % 1900) / 1000.0)
           + (0.05 + (s_suppkey % 5) * 0.04) AS ymax
  FROM supplier)
"""
    return rects + "\nUNION ALL\n".join(
        _pp_intersects_sql(poly, pid) for pid, poly in _OVERLAY_POLYS.items()
    )


@register("polygon_overlay", _overlay_oracle)
def polygon_overlay(spark, sf_dir):
    """Polygon-polygon overlay join: literal zones x key-derived footprint
    rects; exact cell-cover candidate join + polygons_intersect refine.

    The Spark side runs the full generic engine
    (spatial.polygon_overlay_join); the oracle replays the three-part
    intersects predicate with the identical IEEE expression trees over ALL
    zone x rect pairs — cover completeness makes the candidate join a
    strict superset, so agreement checks the cover stage too.
    """
    sup = load_table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k"))
    xmin = F.lit(10.0) + F.pmod(F.col("k") * 53, F.lit(1900)) / F.lit(1000.0)
    ymin = F.lit(46.0) + F.pmod(F.col("k") * 29, F.lit(1900)) / F.lit(1000.0)
    xmax = xmin + (F.lit(0.05) + F.pmod(F.col("k"), F.lit(7)) * F.lit(0.03))
    ymax = ymin + (F.lit(0.05) + F.pmod(F.col("k"), F.lit(5)) * F.lit(0.04))
    rects = sup.select(
        F.concat(F.lit("s"), F.col("k").cast("string")).alias("poly_id"),
        F.array(xmin, ymin, xmax, ymin, xmax, ymax, xmin, ymax).alias("ring"),
    )
    zones = spatial.polygons_df(spark, _OVERLAY_POLYS)
    return spatial.polygon_overlay_join(zones, rects, res=11)


def _geohash_oracle() -> str:
    from ..functions.geohash import geohash_sql

    lon = "((c_custkey * 37) % 360000) / 1000.0 - 180.0"
    lat = "((c_custkey * 91) % 180000) / 1000.0 - 90.0"
    bx, by = 18, 17  # ceil(35/2), floor(35/2) for precision 7
    x = f"CAST(least(floor(({lon} + 180.0) / 360.0 * {1 << bx}), {(1 << bx) - 1}) AS BIGINT)"
    y = f"CAST(least(floor(({lat} + 90.0) / 180.0 * {1 << by}), {(1 << by) - 1}) AS BIGINT)"
    return f"""
SELECT c_custkey AS point_id,
       {geohash_sql(lon, lat, 7)} AS gh7,
       ROUND(({x} + 0.5) / {1 << bx} * 360.0 - 180.0, 6) AS lon_c,
       ROUND(({y} + 0.5) / {1 << by} * 180.0 - 90.0, 6) AS lat_c
FROM customer"""


@register("geohash_points", _geohash_oracle())
def geohash_points(spark, sf_dir):
    """Geohash-7 encode + decode-to-center roundtrip over full-range
    customer-derived points, all JVM shift/mask expressions; the oracle
    replays the identical bit construction in SQL and derives the cell
    centers from the grid indices — a broken decode (non-inverse bit
    layout) would desynchronize lon_c/lat_c.  Public-vector goldens in
    tests/test_geohash.py pin the scheme itself."""
    from ..functions import geohash as gh

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("point_id"),
        (F.pmod(F.col("c_custkey") * 37, F.lit(360000)) / 1000.0 - 180.0).alias("lon"),
        (F.pmod(F.col("c_custkey") * 91, F.lit(180000)) / 1000.0 - 90.0).alias("lat"),
    )
    enc = cust.select(
        "point_id", gh.geohash_col("lon", "lat", 7).alias("gh7")
    )
    lon_c, lat_c = gh.geohash_decode_cols("gh7", 7)
    return enc.select(
        "point_id",
        "gh7",
        F.round(lon_c, 6).alias("lon_c"),
        F.round(lat_c, 6).alias("lat_c"),
    )


@register("hillshade_tiles", None)  # pixel path; exactness in tests/test_terrain.py
def hillshade_tiles(spark, sf_dir):
    """Horn slope/aspect/hillshade over the merged tile raster via the
    same 1-px halo exchange as focal_mean; tests/test_terrain.py proves
    every tile's hillshade canvas equals the NumPy computation over the
    zero-padded global mosaic.  Returned here: per-tile slope/shade
    summaries (the driver's rows-only check), canvases dropped.
    """
    from ..sources.images import generate_images_df
    from . import terrain, tiling

    images = generate_images_df(spark, 48)
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter(F.col("level") == 0)
    out = terrain.hillshade(merged)
    return out.select(
        "var", "tile_x", "tile_y", "n_halo",
        "slope_mean_deg", "slope_max_deg", "shade_mean",
    )


def _quadkey_oracle(zoom: int = 12) -> str:
    from ..functions.quadkey import quadkey_sql

    n = 1 << zoom
    lon = "((c_custkey * 37) % 340000) / 1000.0 - 170.0"
    lat = "((c_custkey * 91) % 160000) / 1000.0 - 80.0"
    tx = (
        f"CAST(least(greatest(floor(({lon} + 180.0) / 360.0 * {n}), 0), {n - 1})"
        " AS BIGINT)"
    )
    ty = (
        f"CAST(least(greatest(floor((1.0 - ln(tan(radians({lat}))"
        f" + 1.0 / cos(radians({lat}))) / pi()) / 2.0 * {n}), 0), {n - 1})"
        " AS BIGINT)"
    )
    return f"""
SELECT c_custkey AS point_id, {tx} AS tile_x, {ty} AS tile_y,
       {quadkey_sql(tx, ty, zoom)} AS quadkey
FROM customer"""


@register("quadkey_tiles", _quadkey_oracle(12))
def quadkey_tiles(spark, sf_dir):
    """WebMercator z12 tile assignment + quadkey encode for full-range
    points (|lat| <= 80, inside Mercator's domain), all JVM expressions;
    a decode roundtrip inequality in tests/test_quadkey.py pins the
    digit layout against the public definition."""
    from ..functions import quadkey as qk

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("point_id"),
        (F.pmod(F.col("c_custkey") * 37, F.lit(340000)) / 1000.0 - 170.0).alias("lon"),
        (F.pmod(F.col("c_custkey") * 91, F.lit(160000)) / 1000.0 - 80.0).alias("lat"),
    )
    tx, ty = qk.mercator_tile_cols("lon", "lat", 12)
    tiles = cust.select("point_id", tx.alias("tile_x"), ty.alias("tile_y"))
    return tiles.select(
        "point_id", "tile_x", "tile_y",
        qk.quadkey_col(F.col("tile_x"), F.col("tile_y"), 12).alias("quadkey"),
    )
