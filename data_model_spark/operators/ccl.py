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

Node ids pack (tile_x, tile_y, local label) into int64 (20/20/20 bits,
bounds checked) — injective, so the merge is exact.  The whole pipeline
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


def _node(tx: int, ty: int, lab: np.ndarray | int):
    if not (0 <= tx <= _B20 and 0 <= ty <= _B20):
        raise ValueError(f"tile coords out of packable range: {(tx, ty)}")
    return (np.int64(tx) << 40) | (np.int64(ty) << 20) | np.int64(lab)


_LOCAL_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),   # 'label' | 'border'
        T.StructField("node", T.LongType(), False),
        T.StructField("px", T.LongType(), False),        # label rows
        T.StructField("ik", T.StringType(), False),      # border rows: interface key
        T.StructField("pos", T.IntegerType(), False),
        T.StructField("side", T.StringType(), False),
    ]
)


def raster_regions(tiles: DataFrame, threshold: int) -> DataFrame:
    """(region, px, n_labels): global 4-connected foreground regions.

    ``region`` is the min packed (tile, label) node id of the component;
    ``px`` its exact pixel count; ``n_labels`` the number of per-tile
    fragments it stitches (1 = never crossed a tile border).
    """

    def local(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                mask = canvas >= threshold
                labels, n = label_tile(mask)
                tx, ty = int(row.tile_x), int(row.tile_y)
                if n:
                    cnt = np.bincount(labels.ravel(), minlength=n + 1)
                    for lab in range(1, n + 1):
                        recs.append(
                            {"kind": "label", "node": int(_node(tx, ty, lab)),
                             "px": int(cnt[lab]), "ik": "", "pos": 0, "side": ""}
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
                            {"kind": "border", "node": int(_node(tx, ty, vec[pos])),
                             "px": 0, "ik": ik, "pos": int(pos), "side": side}
                        )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _LOCAL_SCHEMA.fields}
            )

    local_out = tiles.select(
        "var", "level", "tile_x", "tile_y", "data"
    ).mapInPandas(local, _LOCAL_SCHEMA).localCheckpoint()

    labels = local_out.filter(F.col("kind") == "label").select("node", "px")
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
        labels["node"].alias("n"), F.coalesce("comp", labels["node"]).alias("region"), "px"
    )
    return lbl.groupBy("region").agg(
        F.sum("px").alias("px"), F.count("*").alias("n_labels")
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
