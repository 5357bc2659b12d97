"""Zonal statistics: aggregate raster pixels over vector zones.

The raster-side half of raster<->vector analytics (per-field crop stats,
per-admin-region reflectance means).  Zones are meter-space rectangles on
the scene grid; the raster is the merged global tile table
(``tiling.merge_tiles`` output: one 256^2 canvas per (var, level, tile)).

Scale design — the whole point of running zonal stats on a *tiled* raster:

* **Interior tiles never decode.**  A tile fully inside a zone contributes
  its precomputed canvas aggregate (``px_sum``; count is the full canvas)
  as pure column arithmetic — at 100 TB the interior/perimeter ratio means
  almost all pixels are summarized from metadata at zero pixel cost.
* **Boundary tiles decode once, clipped.**  Only tiles crossing a zone
  edge enter the Arrow/pandas stage, and each decodes exactly the pixel
  window the zone clips out of it.
* **Zone->tile assignment is an equi-join.**  Zones explode to the tile
  keys they intersect (integer ``sequence`` ranges — output-proportional),
  then equi-join the tile table on (tile_x, tile_y); with few zones the
  exploded side broadcasts, with many it co-partitions on the tile key.

Pixel-inclusion rule: a pixel counts for a zone iff its full ground
footprint lies inside the zone rectangle (half-open [x0,x1) x [y0,y1)
meters).  With integer-meter zones and the 10 m grid the rule is exact
integer arithmetic on both the planning and the clipping side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import images as img_src
from .tiling import TILE_PX
from ..codecs import decode_image

ZONE_SCHEMA = "zone_id string, x0 long, y0 long, x1 long, y1 long"

_PART_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.StringType(), False),
        T.StructField("var", T.StringType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("px_sum", T.DoubleType(), False),
    ]
)


def zones_df(spark, zones: dict[str, tuple[int, int, int, int]]) -> DataFrame:
    from ..sources.tables import local_df

    rows = [(zid, *map(int, box)) for zid, box in sorted(zones.items())]
    return local_df(spark, rows, ZONE_SCHEMA)


def zonal_stats(
    tiles: DataFrame,
    zones: DataFrame,
    level: int = 0,
    pixel_m: float = img_src.PIXEL_SIZE_M,
    decode_all: bool = False,
) -> DataFrame:
    """Per-(zone, var) pixel count / sum / mean over the merged tile canvas.

    ``tiles``: ``merge_tiles`` output.  ``zones``: (zone_id, x0, y0, x1, y1)
    integer meters, half-open.  Unfilled canvas pixels are zeros and count
    toward ``n_px`` (canvas semantics — identical in the metadata and the
    decode path, so the two paths compose exactly).

    Precondition: merged ``px_sum`` is fragment-additive, so the metadata
    fast path equals the canvas only when no two same-var fragments
    overlapped a pixel — i.e. feed scenes through ``tiling.
    latest_revision`` first (or any catalog with non-overlapping same-var
    footprints, like the synthetic grid).  For catalogs that do overlap,
    ``decode_all=True`` routes every window through the decode path,
    which is always canvas-exact (at full pixel cost).
    """
    px_m = int(pixel_m * (1 << level))
    tile_m = TILE_PX * px_m
    t = tiles.filter(F.col("level") == level)

    # zone -> intersecting tile keys (integer ranges).  Size = total
    # zone-tile intersections, which grows with zone extent × level: no
    # forced broadcast — AQE broadcasts when it measures small.
    zt = (
        zones.withColumn(
            "tile_x", F.explode(F.sequence(F.expr(f"x0 div {tile_m}"), F.expr(f"(x1 - 1) div {tile_m}")))
        )
        .withColumn(
            "tile_y", F.explode(F.sequence(F.expr(f"y0 div {tile_m}"), F.expr(f"(y1 - 1) div {tile_m}")))
        )
        .filter((F.col("x1") > F.col("x0")) & (F.col("y1") > F.col("y0")))
    )
    joined = t.join(zt, ["tile_x", "tile_y"])

    # clipped pixel window of this zone inside this tile, in canvas indices:
    # columns (x grows east), rows (canvas row 0 is the tile's north edge)
    c0 = F.greatest(F.lit(0), F.ceil((F.col("x0") - F.col("tile_x") * tile_m) / px_m))
    c1 = F.least(F.lit(TILE_PX), F.floor((F.col("x1") - F.col("tile_x") * tile_m) / px_m))
    # y in [y0, y1) full-pixel rows; canvas row r spans y in
    # [(tile_y+1)*tile_m - (r+1)*px_m, (tile_y+1)*tile_m - r*px_m)
    r0 = F.greatest(
        F.lit(0), F.ceil(((F.col("tile_y") + 1) * tile_m - F.col("y1")) / px_m)
    )
    r1 = F.least(
        F.lit(TILE_PX), F.floor(((F.col("tile_y") + 1) * tile_m - F.col("y0")) / px_m)
    )
    win = (
        joined.withColumn("c0", c0.cast("long"))
        .withColumn("c1", c1.cast("long"))
        .withColumn("r0", r0.cast("long"))
        .withColumn("r1", r1.cast("long"))
        .filter((F.col("c1") > F.col("c0")) & (F.col("r1") > F.col("r0")))
    )
    full = (
        (F.col("c0") == 0)
        & (F.col("c1") == TILE_PX)
        & (F.col("r0") == 0)
        & (F.col("r1") == TILE_PX)
    )
    if decode_all:
        full = F.lit(False)

    # interior path: canvas aggregate from metadata only (unfilled = 0)
    interior = win.filter(full).select(
        "zone_id",
        "var",
        F.lit(TILE_PX * TILE_PX).cast("long").alias("n_px"),
        F.col("px_sum"),
    )

    # boundary path: decode once, clip the window, vectorized NumPy sum
    def clip(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                block = canvas[row.r0 : row.r1, row.c0 : row.c1]
                recs.append(
                    {
                        "zone_id": row.zone_id,
                        "var": row.var,
                        "n_px": int(block.size),
                        "px_sum": float(block.astype(np.float64).sum()),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _PART_SCHEMA.fields}
            )

    boundary = (
        win.filter(~full)
        .select("zone_id", "var", "data", "r0", "r1", "c0", "c1")
        .mapInPandas(clip, _PART_SCHEMA)
    )

    return (
        interior.unionByName(boundary)
        .groupBy("zone_id", "var")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.sum("px_sum").alias("px_sum"),
            (F.sum("px_sum") / F.sum("n_px")).alias("px_mean"),
        )
    )


_ASSIGN_SCHEMA = T.StructType(
    [
        T.StructField("zone_id", T.StringType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("full", T.BooleanType(), False),
    ]
)


def zonal_stats_poly(
    tiles: DataFrame,
    polys: dict[str, "np.ndarray"],
    level: int = 0,
    pixel_m: float = img_src.PIXEL_SIZE_M,
) -> DataFrame:
    """Per-(zone, var) pixel stats over arbitrary polygon zones.

    ``polys``: zone_id -> (N, 2) open ring in scene-grid meters (any simple
    polygon, convex or not).  Pixel-inclusion rule: CENTER-in-polygon
    (even-odd ray cast) — the standard raster burn-in rule; a tile whose
    rectangle lies fully inside the polygon has every center inside, so
    the two paths below agree by construction:

    * **Interior tiles** (all 4 corners inside, no polygon vertex inside
      the tile, no edge crossing — exact for simple polygons) contribute
      their canvas metadata (``px_sum``; full canvas count) with no
      decode, so a country-sized zone over a 100 TB mosaic reads pixels
      only along its perimeter.
    * **Boundary tiles** decode once and mask pixel centers with one
      vectorized ray cast (O(pixels x edges) elementwise).

    The polygon set rides a driver dict closure-broadcast to both the
    classification and the clip stages (the small-dim side, like the GCP
    grids in ``operators/reproject.py``); tile assignment itself stays
    distributed — a JVM ``sequence`` explode over each zone's bbox tile
    range, classified in an Arrow batch stage, then equi-joined to the
    tile table on the tile key.

    Same precondition as ``zonal_stats``: fragment-additive ``px_sum``
    (feed ``tiling.latest_revision`` output when catalogs revise scenes).
    """
    from ..functions import geometry as G
    from ..sources.tables import local_df

    px_m = int(pixel_m * (1 << level))
    tile_m = TILE_PX * px_m
    t = tiles.filter(F.col("level") == level)
    polys = {z: np.asarray(p, dtype=np.float64) for z, p in polys.items()}

    bbox_rows = []
    for zid, poly in sorted(polys.items()):
        x0, y0 = poly.min(axis=0)
        x1, y1 = poly.max(axis=0)
        bbox_rows.append((zid, int(np.floor(x0 / tile_m)), int(np.floor(y0 / tile_m)),
                          int(np.floor(x1 / tile_m)), int(np.floor(y1 / tile_m))))
    boxes = local_df(
        tiles.sparkSession,
        bbox_rows,
        "zone_id string, tx0 long, ty0 long, tx1 long, ty1 long",
    )
    cand = boxes.withColumn(
        "tile_x", F.explode(F.sequence("tx0", "tx1"))
    ).withColumn("tile_y", F.explode(F.sequence("ty0", "ty1"))).select(
        "zone_id", "tile_x", "tile_y"
    )

    def classify(batches):
        for pdf in batches:
            outs = []
            for zid, grp in pdf.groupby("zone_id", sort=False):
                poly = polys[zid]
                lo_x = grp["tile_x"].to_numpy() * float(tile_m)
                lo_y = grp["tile_y"].to_numpy() * float(tile_m)
                hi_x, hi_y = lo_x + tile_m, lo_y + tile_m
                hit = G.rects_intersect_polygon(lo_x, lo_y, hi_x, hi_y, poly)
                if not hit.any():
                    continue
                cx = np.stack([lo_x, hi_x, lo_x, hi_x], axis=1).ravel()
                cy = np.stack([lo_y, lo_y, hi_y, hi_y], axis=1).ravel()
                corners_in = (
                    G.points_in_polygon(cx, cy, poly).reshape(-1, 4).all(axis=1)
                )
                vx, vy = poly[:, 0], poly[:, 1]
                vert_in = (
                    (vx[None, :] > lo_x[:, None]) & (vx[None, :] < hi_x[:, None])
                    & (vy[None, :] > lo_y[:, None]) & (vy[None, :] < hi_y[:, None])
                ).any(axis=1)
                # a notch can dip across a tile side between two inside
                # corners with BOTH its vertices outside the tile — the
                # corner and vertex tests miss it, so the edge-cross test
                # is load-bearing, not belt-and-braces
                px1, py1 = vx, vy
                px2, py2 = np.roll(px1, -1), np.roll(py1, -1)
                cross = np.zeros(lo_x.size, dtype=bool)
                for ax1, ay1, ax2, ay2 in (
                    (lo_x, lo_y, hi_x, lo_y),
                    (hi_x, lo_y, hi_x, hi_y),
                    (hi_x, hi_y, lo_x, hi_y),
                    (lo_x, hi_y, lo_x, lo_y),
                ):
                    cross |= G._segments_cross(
                        ax1[:, None], ay1[:, None], ax2[:, None], ay2[:, None],
                        px1[None, :], py1[None, :], px2[None, :], py2[None, :],
                    ).any(axis=1)
                full = corners_in & ~vert_in & ~cross
                sub = grp.loc[hit, ["tile_x", "tile_y"]].copy()
                sub.insert(0, "zone_id", zid)
                sub["full"] = full[hit]
                outs.append(sub)
            yield pd.concat(outs) if outs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _ASSIGN_SCHEMA.fields}
            )

    # assign grows with zone-tile intersections: AQE-chosen join, not forced
    assign = cand.mapInPandas(classify, _ASSIGN_SCHEMA)
    joined = t.join(assign, ["tile_x", "tile_y"])

    interior = joined.filter(F.col("full")).select(
        "zone_id",
        "var",
        F.lit(TILE_PX * TILE_PX).cast("long").alias("n_px"),
        F.col("px_sum"),
    )

    def clip(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                poly = polys[row.zone_id]
                canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                xs = row.tile_x * tile_m + (np.arange(TILE_PX) + 0.5) * px_m
                ys = (row.tile_y + 1) * tile_m - (np.arange(TILE_PX) + 0.5) * px_m
                gx, gy = np.meshgrid(xs, ys)
                mask = G.points_in_polygon(gx.ravel(), gy.ravel(), poly).reshape(
                    TILE_PX, TILE_PX
                )
                if not mask.any():
                    continue
                recs.append(
                    {
                        "zone_id": row.zone_id,
                        "var": row.var,
                        "n_px": int(mask.sum()),
                        "px_sum": float(canvas[mask].astype(np.float64).sum()),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _PART_SCHEMA.fields}
            )

    boundary = (
        joined.filter(~F.col("full"))
        .select("zone_id", "var", "data", "tile_x", "tile_y")
        .mapInPandas(clip, _PART_SCHEMA)
    )

    return (
        interior.unionByName(boundary)
        .groupBy("zone_id", "var")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.sum("px_sum").alias("px_sum"),
            (F.sum("px_sum") / F.sum("n_px")).alias("px_mean"),
        )
    )
