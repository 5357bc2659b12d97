"""Distributed connected-component labeling over the tile raster
(blob extraction — the raster half of GDAL-style polygonize).

Labels maximal 4-connected foreground regions (pixels with value >=
threshold) across the WHOLE mosaic, not per tile:

1. **Local pass** (one ``mapInPandas`` over the tile scan, no halo): a
   classic two-pass union-find labels each tile independently; the task
   emits per-label (pixel count) rows and the four BORDER strips
   (position, local label) — the only data that leaves the tile.
2. **Stitch join**: the two tiles meeting at each interface emit their
   facing strips under a shared interface key; one equi-join yields the
   cross-tile adjacency edges between (tile, local-label) nodes.
3. **Global union**: ``components.connected_components`` (the shipped
   large-star/small-star rounds) merges the node graph; singleton labels
   keep their own node id, regions get the min reachable node id.

Node ids pack (layer, tile_x, tile_y, local label) into int64
(7/20/20/16 bits, bounds checked) — injective ACROSS (var, level)
layers, which routinely cover the same tile coords — so the merge is
exact.  The whole pipeline
is integer arithmetic end to end; ``tests/test_ccl.py`` proves the
region partition equals a sequential global union-find on ramps, stripes
crossing seams, and random mosaics.

Scale shape: shuffle volume after the local pass is per-LABEL rows plus
4 x 256-pixel border strips per tile — O(perimeter), not O(area); the
iterative merge touches only the (tile, label) graph, which is orders of
magnitude smaller than the pixel grid.  This is the standard distributed
CCL decomposition (e.g. Playne & Hawick, IEEE TPDS 2018).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from .components import connected_components
from .registry import register
from .tiling import TILE_PX

_B20 = (1 << 20) - 1


def label_tile(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """Two-pass 4-connected labeling. Returns (labels int32 (0 = bg,
    regions 1..n), n)."""
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent: list[int] = [0]

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nxt = 1
    for r in range(h):
        row = mask[r]
        lab = labels[r]
        up = labels[r - 1] if r else None
        for c in range(w):
            if not row[c]:
                continue
            left = lab[c - 1] if c else 0
            above = up[c] if up is not None else 0
            if left and above:
                rl, ra = find(left), find(above)
                lab[c] = min(rl, ra)
                if rl != ra:
                    parent[max(rl, ra)] = min(rl, ra)
            elif left or above:
                lab[c] = left or above
            else:
                parent.append(nxt)
                lab[c] = nxt
                nxt += 1
    # flatten + densify
    roots = np.array([find(i) for i in range(nxt)], dtype=np.int32)
    remap = np.zeros(nxt, dtype=np.int32)
    dense = 0
    for i in range(1, nxt):
        if roots[i] == i:
            dense += 1
            remap[i] = dense
    out = remap[roots[labels]]
    return out, dense


def _node(gi: int, tx: int, ty: int, lab: np.ndarray | int):
    """Pack (group, tile_x, tile_y, local label) into a positive int64:
    7 + 20 + 20 + 16 bits.  ``gi`` keys the (var, level) layer — two
    layers routinely cover the SAME tile coords, and their local labels
    must never union (bug caught by the multi-band mosaic: b04/b07
    fragments at one tile coord merged before gi was packed in)."""
    if not (0 <= gi <= 127 and 0 <= tx <= _B20 and 0 <= ty <= _B20):
        raise ValueError(f"group/tile out of packable range: {(gi, tx, ty)}")
    return (
        (np.int64(gi) << 56) | (np.int64(tx) << 36)
        | (np.int64(ty) << 16) | np.int64(lab)
    )


_LOCAL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),   # 'label' | 'border'
        T.StructField("node", T.LongType(), False),
        T.StructField("px", T.LongType(), False),        # label rows
        T.StructField("ik", T.StringType(), False),      # border rows: interface key
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("side", T.StringType(), False),
        # per-label geometry in GLOBAL pixel coords (label rows; 0 on
        # border rows): bbox corners and coordinate sums for centroids
        T.StructField("minx", T.LongType(), False),
        T.StructField("maxx", T.LongType(), False),
        T.StructField("miny", T.LongType(), False),
        T.StructField("maxy", T.LongType(), False),
        T.StructField("sx", T.LongType(), False),
        T.StructField("sy", T.LongType(), False),
    ]
)


def _labeled_frames(tiles: DataFrame, threshold: int):
    """(labels_df, comps_df): the per-tile label rows (with geometry
    sums) and the stitched component mapping — shared by
    ``raster_regions`` and ``raster_region_stats``.

    Global pixel coordinates: gx = tile_x*T + col, gy = tile_y*T +
    (T-1-row) — row 0 is a tile's NORTH edge (it adjoins tile_y+1), so
    gy grows north like tile_y.  Per-tile coordinate sums stay exact in
    float64 bincount weights (<= 65536 px * 2^28 coord < 2^53) and are
    summed across tiles in decimal(38,0) — a 10^12-pixel region's sum
    overflows int64.

    Each (var, level) layer is an independent labeling domain: its index
    ``gi`` is packed into the node id (the driver-side distinct is a
    tiny metadata collect), because different layers routinely cover the
    same tile coords and interface keys alone only scope the EDGES.
    """
    groups = sorted(
        (r["var"], r["level"])
        for r in tiles.select("var", "level").distinct().collect()
    )
    gi_of = {g: i for i, g in enumerate(groups)}

    def local(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                mask = canvas >= threshold
                labels, n = label_tile(mask)
                tx, ty = int(row.tile_x), int(row.tile_y)
                gi = gi_of[(row.var, row.level)]
                if n > 0xFFFF:
                    raise ValueError(f"{n} local labels exceed 16-bit packing")
                if n:
                    cnt = np.bincount(labels.ravel(), minlength=n + 1)
                    ys, xs = np.nonzero(labels)
                    labs = labels[ys, xs]
                    gxs = tx * TILE_PX + xs
                    gys = ty * TILE_PX + (TILE_PX - 1 - ys)
                    sx = np.bincount(labs, weights=gxs, minlength=n + 1)
                    sy = np.bincount(labs, weights=gys, minlength=n + 1)
                    big = 1 << 40
                    mnx = np.full(n + 1, big, dtype=np.int64)
                    mxx = np.full(n + 1, -1, dtype=np.int64)
                    mny = np.full(n + 1, big, dtype=np.int64)
                    mxy = np.full(n + 1, -1, dtype=np.int64)
                    np.minimum.at(mnx, labs, gxs)
                    np.maximum.at(mxx, labs, gxs)
                    np.minimum.at(mny, labs, gys)
                    np.maximum.at(mxy, labs, gys)
                    for lab in range(1, n + 1):
                        recs.append(
                            {"kind": "label", "node": int(_node(gi, tx, ty, lab)),
                             "px": int(cnt[lab]), "ik": "", "pos": 0, "side": "",
                             "minx": int(mnx[lab]), "maxx": int(mxx[lab]),
                             "miny": int(mny[lab]), "maxy": int(mxy[lab]),
                             "sx": int(sx[lab]), "sy": int(sy[lab])}
                        )
                # borders: east/west interfaces keyed by the boundary x;
                # north (canvas row 0, adjoins tile_y+1) / south keyed by
                # the northern tile_y
                for side, vec, ik in (
                    ("a", labels[:, TILE_PX - 1], f"v:{row.var}:{row.level}:{tx + 1}:{ty}"),
                    ("b", labels[:, 0], f"v:{row.var}:{row.level}:{tx}:{ty}"),
                    ("a", labels[0, :], f"h:{row.var}:{row.level}:{tx}:{ty + 1}"),
                    ("b", labels[TILE_PX - 1, :], f"h:{row.var}:{row.level}:{tx}:{ty}"),
                ):
                    for pos in np.flatnonzero(vec):
                        recs.append(
                            {"kind": "border", "node": int(_node(gi, tx, ty, vec[pos])),
                             "px": 0, "ik": ik, "pos": int(pos), "side": side,
                             "minx": 0, "maxx": 0, "miny": 0, "maxy": 0,
                             "sx": 0, "sy": 0}
                        )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _LOCAL_SCHEMA.fields}
            )

    local_out = tiles.select(
        "var", "level", "tile_x", "tile_y", "data"
    ).mapInPandas(local, _LOCAL_SCHEMA).localCheckpoint()

    labels = local_out.filter(F.col("kind") == "label").drop("kind", "ik", "pos", "side")
    borders = local_out.filter(F.col("kind") == "border")
    a = borders.filter(F.col("side") == "a").select(
        F.col("ik").alias("ik"), F.col("pos").alias("pos"), F.col("node").alias("na")
    )
    b = borders.filter(F.col("side") == "b").select(
        F.col("ik").alias("ik"), F.col("pos").alias("pos"), F.col("node").alias("nb")
    )
    edges = a.join(b, ["ik", "pos"]).select("na", "nb").distinct()

    comps = connected_components(edges, "na", "nb")
    lbl = labels.join(comps, labels["node"] == comps["node"], "left").select(
        F.coalesce("comp", labels["node"]).alias("region"), labels["*"]
    ).drop("node")
    return lbl


def raster_regions(tiles: DataFrame, threshold: int) -> DataFrame:
    """(region, px, n_labels): global 4-connected foreground regions.

    ``region`` is the min packed (tile, label) node id of the component;
    ``px`` its exact pixel count; ``n_labels`` the number of per-tile
    fragments it stitches (1 = never crossed a tile border).
    """
    return _labeled_frames(tiles, threshold).groupBy("region").agg(
        F.sum("px").alias("px"), F.count("*").alias("n_labels")
    )


def raster_region_stats(tiles: DataFrame, threshold: int) -> DataFrame:
    """(region, px, n_labels, minx, maxx, miny, maxy, cx, cy): regions
    with their global-pixel bounding box and centroid — the attribute
    half of GDAL-style polygonize.

    bbox corners are exact int64 min/max reductions over the stitched
    fragments; the centroid is the single IEEE division of the exact
    decimal(38,0) coordinate sums by the exact pixel count — both
    associative reductions, so stitching order (and parallelism) cannot
    change the answer.
    """
    lbl = _labeled_frames(tiles, threshold)
    return lbl.groupBy("region").agg(
        F.sum("px").alias("px"),
        F.count("*").alias("n_labels"),
        F.min("minx").alias("minx"),
        F.max("maxx").alias("maxx"),
        F.min("miny").alias("miny"),
        F.max("maxy").alias("maxy"),
        (
            F.sum(F.col("sx").cast("decimal(38,0)")).cast("double")
            / F.sum("px").cast("double")
        ).alias("cx"),
        (
            F.sum(F.col("sy").cast("decimal(38,0)")).cast("double")
            / F.sum("px").cast("double")
        ).alias("cy"),
    )


def reference_regions(G: np.ndarray, threshold: int) -> list[int]:
    """Sorted pixel counts of the 4-connected foreground regions of the
    global mosaic (sequential union-find truth)."""
    labels, n = label_tile(G >= threshold)
    if n == 0:
        return []
    cnt = np.bincount(labels.ravel(), minlength=n + 1)
    return sorted(int(c) for c in cnt[1:])


@register("raster_regions", None)  # pixel path; exactness in tests/test_ccl.py
def raster_regions_query(spark, sf_dir):
    """Global blob extraction (value >= 1500) over the merged level-0
    mosaic: per-region exact pixel counts and stitched-fragment counts.
    The mosaic holds Sentinel-like reflectances (0..~5000); 1500 yields
    ~2k regions of which ~540 stitch across tile borders, so the driver
    rows exercise both the local pass and the interface join.  Rows-only;
    the region partition is proven equal to a sequential global
    union-find in tests/test_ccl.py."""
    from .hydrology import _merged_tiles

    out = raster_regions(_merged_tiles(spark), threshold=1500)
    # stable rows for the driver: distribution by (px, n_labels)
    return out.groupBy("px", "n_labels").agg(F.count("*").alias("n_regions"))

def reference_region_stats(
    G: np.ndarray, threshold: int, tx0: int, ty_max: int
) -> set[tuple]:
    """{(px, minx, maxx, miny, maxy, sx, sy)} of the global mosaic's
    regions (sequential truth).  ``G``'s row 0 is the NORTH edge of the
    tile row ``ty_max``; column 0 starts tile column ``tx0``."""
    labels, n = label_tile(G >= threshold)
    out = set()
    T_ = TILE_PX
    for lab in range(1, n + 1):
        rs, cs = np.nonzero(labels == lab)
        gx = tx0 * T_ + cs
        ty = ty_max - rs // T_
        gy = ty * T_ + (T_ - 1 - (rs % T_))
        out.add((
            int(rs.size), int(gx.min()), int(gx.max()),
            int(gy.min()), int(gy.max()), int(gx.sum()), int(gy.sum()),
        ))
    return out


@register("raster_region_stats", None)  # pixel path; tests/test_ccl.py
def raster_region_stats_query(spark, sf_dir):
    """Polygonize attributes of the value >= 1500 regions of the merged
    level-0 mosaic: exact global-pixel bounding boxes and IEEE centroids
    per region.  Rows-only; bbox/centroid equality with the sequential
    global union-find is pinned in tests/test_ccl.py."""
    from .hydrology import _merged_tiles

    return raster_region_stats(_merged_tiles(spark), threshold=1500)
