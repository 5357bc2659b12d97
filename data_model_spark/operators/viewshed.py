"""Distributed viewshed (line-of-sight visibility) over the tiled DEM
mosaic, radius-bounded, integer-exact.

The last classic terrain kernel beside hillshade / slope / contours /
flow / cost-distance (`operators/terrain.py`, `hydrology.py`,
`costdist.py`): which pixels within radius R see an observer standing H
units above the surface.  The merged level-0 mosaic is read as the DEM
(uint16 elevations), observers are a small parameter set — the
GCP-style broadcast-small boundary `operators/reproject.py` documents.

Exactness: the usual R3 viewshed interpolates elevations along the ray
in floats; here each target is tested along its BRESENHAM ray with the
slope comparison cross-multiplied —

    blocked(target)  iff  exists intermediate k:
        (E_k - E_obs) * K  >=  (E_t - E_obs) * k

with k/K integer step indices and E int64, so there is no division, no
rounding, and the DuckDB oracle replays the kernel bit-exactly.

Scale shape:

* each observer needs the tiles of its R-window only — a bounded
  ``ceil(R/256)``-ring, enumerated driver-side from the observer list
  (small by contract) into a (obs_id, tile key) cover table;
* ONE broadcast hash join routes stored tiles to observers (tiles side
  streams, cover side is |observers| * O(1) rows), then one hash
  shuffle groups windows per observer — the merge_tiles stream shape;
* per-observer work is O(R^3) rays independent of mosaic extent, and
  observers parallelize across executors; missing tiles are elevation 0,
  the mosaic's own fill convention, replayed identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from .tiling import TILE_PX

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("obs_id", T.IntegerType(), False),
        T.StructField("var", T.StringType(), False),
        T.StructField("obs_gx", T.LongType(), False),
        T.StructField("obs_gy", T.LongType(), False),
        T.StructField("n_tiles", T.IntegerType(), False),
        T.StructField("visible_px", T.LongType(), False),
        T.StructField("considered_px", T.LongType(), False),
        T.StructField("vis_gx_sum", T.LongType(), False),
        T.StructField("vis_gy_sum", T.LongType(), False),
    ]
)


def _bresenham(r0: int, c0: int, r1: int, c1: int):
    """Integer line cells from (r0,c0) to (r1,c1), endpoints included."""
    dr, dc = abs(r1 - r0), abs(c1 - c0)
    sr = 1 if r1 >= r0 else -1
    sc = 1 if c1 >= c0 else -1
    err = dc - dr
    r, c = r0, c0
    while True:
        yield r, c
        if r == r1 and c == c1:
            return
        e2 = 2 * err
        if e2 > -dr:
            err -= dr
            c += sc
        if e2 < dc:
            err += dc
            r += sr


def viewshed_kernel(Z: np.ndarray, orow: int, ocol: int, height: int,
                    radius: int):
    """Exact visibility over window ``Z`` (int64 elevations) from observer
    at (orow, ocol) standing ``height`` above the surface.  Returns the
    bool visibility mask of the radius disc (euclidean, <=) — shared
    verbatim with the sequential oracle replay."""
    H, W = Z.shape
    obs = int(Z[orow, ocol]) + height
    vis = np.zeros((H, W), dtype=bool)
    r2 = radius * radius
    for r in range(max(0, orow - radius), min(H, orow + radius + 1)):
        for c in range(max(0, ocol - radius), min(W, ocol + radius + 1)):
            if (r - orow) ** 2 + (c - ocol) ** 2 > r2:
                continue
            cells = list(_bresenham(orow, ocol, r, c))
            K = len(cells) - 1
            if K <= 0:
                vis[r, c] = True  # the observer's own cell
                continue
            t_rel = int(Z[r, c]) - obs
            blocked = False
            for k in range(1, K):
                rr, cc = cells[k]
                if (int(Z[rr, cc]) - obs) * K >= t_rel * k:
                    blocked = True
                    break
            vis[r, c] = not blocked
    return vis


def _window_of(gx: int, gy: int, radius: int):
    """Tile-key window covering the radius disc around global px (gx, gy).
    gy is a NORTH-up global row coordinate (tile_y*TILE_PX + row from the
    tile's south edge is NOT used — gy counts px north of y=0, matching
    tile_y*TILE_PX .. (tile_y+1)*TILE_PX)."""
    tx0, tx1 = (gx - radius) // TILE_PX, (gx + radius) // TILE_PX
    ty0, ty1 = (gy - radius) // TILE_PX, (gy + radius) // TILE_PX
    return tx0, tx1, ty0, ty1


def viewshed(tiles: DataFrame, observers: list[tuple], radius: int = 64,
             height: int = 10) -> DataFrame:
    """Per-observer visibility fingerprints over the merged tile DEM.

    ``observers`` = [(var, gx, gy)] in global pixel coordinates (gx east,
    gy north of the grid origin) — small by contract (broadcast).
    """
    spark = tiles.sparkSession
    cover_rows = []
    for obs_id, (var, gx, gy) in enumerate(observers):
        tx0, tx1, ty0, ty1 = _window_of(int(gx), int(gy), radius)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                cover_rows.append(
                    {"obs_id": obs_id, "var": var, "level": 0,
                     "tile_x": tx, "tile_y": ty,
                     "obs_gx": int(gx), "obs_gy": int(gy)}
                )
    cover = spark.createDataFrame(pd.DataFrame.from_records(cover_rows))

    routed = tiles.select(
        "var", "level", "tile_x", "tile_y", "data"
    ).join(F.broadcast(cover), ["var", "level", "tile_x", "tile_y"])

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions", "64"))

    def stream(batches):
        cur: tuple | None = None
        msgs: list = []
        out: list[dict] = []

        def emit() -> dict:
            obs_id, var, gx, gy = cur
            tx0, tx1, ty0, ty1 = _window_of(gx, gy, radius)
            W = (tx1 - tx0 + 1) * TILE_PX
            H = (ty1 - ty0 + 1) * TILE_PX
            Z = np.zeros((H, W), dtype=np.int64)
            for tx, ty, buf in msgs:
                canvas = decode_image(buf, "raw-u16", TILE_PX, TILE_PX)
                # canvas row 0 = tile's north edge; window row 0 = the
                # window's north edge (tile_y = ty1)
                mr = (ty1 - ty) * TILE_PX
                mc = (tx - tx0) * TILE_PX
                Z[mr : mr + TILE_PX, mc : mc + TILE_PX] = canvas
            orow = (ty1 + 1) * TILE_PX - gy
            ocol = gx - tx0 * TILE_PX
            vis = viewshed_kernel(Z, orow, ocol, height, radius)
            rr, cc = np.nonzero(vis)
            # visible cells back to global coordinates
            vgx = cc + tx0 * TILE_PX
            vgy = (ty1 + 1) * TILE_PX - rr
            disc = _disc_size(Z.shape, orow, ocol, radius)
            return {
                "obs_id": obs_id,
                "var": var,
                "obs_gx": gx,
                "obs_gy": gy,
                "n_tiles": len(msgs),
                "visible_px": int(vis.sum()),
                "considered_px": disc,
                "vis_gx_sum": int(vgx.sum()),
                "vis_gy_sum": int(vgy.sum()),
            }

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key = (int(row.obs_id), row.var, int(row.obs_gx), int(row.obs_gy))
                if key != cur:
                    if cur is not None:
                        out.append(emit())
                    cur, msgs = key, []
                msgs.append((int(row.tile_x), int(row.tile_y), row.data))
        if cur is not None:
            out.append(emit())
        yield (
            pd.DataFrame.from_records(out)
            if out
            else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _OUT_SCHEMA.fields}
            )
        )

    return (
        routed.repartition(n_shuffle, "obs_id")
        .sortWithinPartitions("obs_id", "tile_x", "tile_y")
        .mapInPandas(stream, _OUT_SCHEMA)
    )


def _disc_size(shape, orow: int, ocol: int, radius: int) -> int:
    H, W = shape
    n = 0
    r2 = radius * radius
    for r in range(max(0, orow - radius), min(H, orow + radius + 1)):
        dr2 = (r - orow) ** 2
        for c in range(max(0, ocol - radius), min(W, ocol + radius + 1)):
            if dr2 + (c - ocol) ** 2 <= r2:
                n += 1
    return n


# ---------------------------------------------------------------------------
# registered oracle-twin query
# ---------------------------------------------------------------------------

from . import replay  # noqa: E402
from .mosaic_fp import _values_sql  # noqa: E402
from .registry import register  # noqa: E402

_VIEW_N = 24
_RADIUS, _HEIGHT = 48, 10


def _observers() -> list[tuple]:
    """Deterministic observers: the center of the first stored tile of
    each of the first 4 reflectance vars in the fixture."""
    cv = replay.merged_canvases(_VIEW_N)
    seen: dict[str, tuple] = {}
    for var, tx, ty in sorted(cv):
        if var not in seen and var.startswith("b"):
            gx = tx * TILE_PX + TILE_PX // 2
            gy = ty * TILE_PX + TILE_PX // 2
            seen[var] = (var, gx, gy)
        if len(seen) == 4:
            break
    return [seen[k] for k in sorted(seen)]


def _viewshed_oracle() -> str:
    cv = replay.merged_canvases(_VIEW_N)
    rows = []
    for obs_id, (var, gx, gy) in enumerate(_observers()):
        tx0, tx1, ty0, ty1 = _window_of(gx, gy, _RADIUS)
        W = (tx1 - tx0 + 1) * TILE_PX
        H = (ty1 - ty0 + 1) * TILE_PX
        Z = np.zeros((H, W), dtype=np.int64)
        n_tiles = 0
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                c = cv.get((var, tx, ty))
                if c is None:
                    continue
                n_tiles += 1
                Z[(ty1 - ty) * TILE_PX : (ty1 - ty + 1) * TILE_PX,
                  (tx - tx0) * TILE_PX : (tx - tx0 + 1) * TILE_PX] = c
        orow = (ty1 + 1) * TILE_PX - gy
        ocol = gx - tx0 * TILE_PX
        vis = viewshed_kernel(Z, orow, ocol, _HEIGHT, _RADIUS)
        rr, cc = np.nonzero(vis)
        rows.append(
            (obs_id, var, gx, gy, n_tiles, int(vis.sum()),
             _disc_size(Z.shape, orow, ocol, _RADIUS),
             int((cc + tx0 * TILE_PX).sum()),
             int(((ty1 + 1) * TILE_PX - rr).sum()))
        )
    return _values_sql(
        [
            ("obs_id", "INTEGER"),
            ("var", "VARCHAR"),
            ("obs_gx", "BIGINT"),
            ("obs_gy", "BIGINT"),
            ("n_tiles", "INTEGER"),
            ("visible_px", "BIGINT"),
            ("considered_px", "BIGINT"),
            ("vis_gx_sum", "BIGINT"),
            ("vis_gy_sum", "BIGINT"),
        ],
        rows,
    )


@register("viewshed_fp", _viewshed_oracle)
def viewshed_fp(spark, sf_dir):
    """Radius-48 viewshed from 4 deterministic observers over the
    24-scene DEM mosaic — integer LOS fingerprints, kernel-replay
    hash-checked."""
    from pyspark.sql import functions as Fn

    from ..sources.images import generate_images_df
    from . import tiling

    images = generate_images_df(spark, _VIEW_N)
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter(Fn.col("level") == 0)
    return viewshed(merged, _observers(), radius=_RADIUS, height=_HEIGHT)
