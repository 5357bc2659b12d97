"""Focal (neighborhood) statistics over the tiled raster via halo exchange.

Moving-window raster analytics — focal mean / min / max with a
(2r+1)x(2r+1) box — over the merged global tile table
(``tiling.merge_tiles`` output: one 256^2 canvas per (var, level, tile)).
The reference's overview kernels reduce within a block
(`src/eopf_geozarr/conversion/geozarr.py` downsampling); focal stats are
the sliding-window sibling every raster stack pairs with them
(smoothing, morphology, gradient prep), and the canonical case where a
naive distributed design goes quadratic.

Scale design — halo exchange, the textbook distributed-stencil shape:

* **Each tile ships only its r-pixel edge strips** to the 8 neighbor
  tiles (and its full canvas to itself).  Shuffle volume is
  ``(1 + ~8r/256) x data`` — about 3% overhead at r=1 — instead of the
  9x of re-sending whole canvases, and is O(data) independent of the
  mosaic extent.
* **One shuffle.**  Strip emission is a narrow ``mapInPandas`` over the
  tile scan; assembly hash-partitions on the target tile key and streams
  sorted groups (same repartition + sortWithinPartitions + generator
  pattern as ``merge_tiles`` — one Arrow stream per task, no per-group
  frame overhead).
* **Absent neighbors are zeros**, exactly the merged canvas' own
  fill semantics, so a tile at the mosaic edge computes the same values
  a NumPy convolution of the zero-padded global mosaic would produce —
  the equality `tests/test_focal.py` proves tile-by-tile.
* **All pixel math is vectorized NumPy** (``sliding_window_view`` over
  an int64 padded canvas: window sums are exact integer arithmetic);
  per-row Python only routes buffer references.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from .tiling import TILE_PX

_STRIP_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("tile_x", T.LongType(), False),
        T.StructField("tile_y", T.LongType(), False),
        T.StructField("dx", T.IntegerType(), False),
        T.StructField("dy", T.IntegerType(), False),
        T.StructField("strip_w", T.IntegerType(), False),
        T.StructField("strip_h", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),
    ]
)

_KEY_FIELDS = [
    T.StructField("var", T.StringType(), False),
    T.StructField("level", T.IntegerType(), False),
    T.StructField("tile_x", T.LongType(), False),
    T.StructField("tile_y", T.LongType(), False),
    T.StructField("n_halo", T.IntegerType(), False),
]

_FOCAL_SCHEMA = T.StructType(
    _KEY_FIELDS
    + [
        T.StructField("data", T.BinaryType(), False),
        T.StructField("focal_sum", T.DoubleType(), False),
        T.StructField("focal_min", T.DoubleType(), False),
        T.StructField("focal_max", T.DoubleType(), False),
    ]
)


def halo_exchange(tiles: DataFrame, radius: int, compute, out_fields) -> DataFrame:
    """Generic distributed stencil: pad each tile with r-pixel halos from
    its 8 neighbors (one shuffle, edge strips only) and apply ``compute``.

    ``compute(P, n_halo)`` receives the (TILE_PX+2r)^2 int64 padded canvas
    (zeros outside the stored mosaic) and returns a dict of the fields in
    ``out_fields`` — the stencil kernel (focal mean, hillshade, ...).
    Shared by ``focal_stats`` and ``operators/terrain.py``.
    """
    if radius < 1 or radius > TILE_PX:
        raise ValueError(f"radius must be in 1..{TILE_PX}, got {radius}")
    r = radius
    out_schema = T.StructType(_KEY_FIELDS + list(out_fields))

    def emit_strips(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                canvas = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                for dx in (-1, 0, 1):
                    # dx=+1 sends the east edge to the east neighbor, etc.
                    cols = canvas[:, TILE_PX - r:] if dx == 1 else (
                        canvas[:, :r] if dx == -1 else canvas
                    )
                    for dy in (-1, 0, 1):
                        if dx == 0 and dy == 0:
                            strip = canvas
                        # dy=+1: north neighbor needs this tile's north
                        # edge, which is canvas row 0 (rows run southward)
                        elif dy == 1:
                            strip = cols[:r]
                        elif dy == -1:
                            strip = cols[TILE_PX - r:]
                        else:
                            strip = cols
                        recs.append(
                            {
                                "var": row.var,
                                "level": int(row.level),
                                "tile_x": int(row.tile_x) + dx,
                                "tile_y": int(row.tile_y) + dy,
                                "dx": dx,
                                "dy": dy,
                                "strip_w": strip.shape[1],
                                "strip_h": strip.shape[0],
                                "data": np.ascontiguousarray(strip).tobytes(),
                            }
                        )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _STRIP_SCHEMA.fields}
            )

    strips = tiles.select(
        "var", "level", "tile_x", "tile_y", "data"
    ).mapInPandas(emit_strips, _STRIP_SCHEMA)

    keyed = strips.repartition("var", "level", "tile_x", "tile_y").sortWithinPartitions(
        "var", "level", "tile_x", "tile_y"
    )

    pad = TILE_PX + 2 * r

    def assemble_stream(batches):
        cur_key: tuple | None = None
        msgs: list = []

        def emit() -> dict | None:
            # placement of a strip from direction (dx, dy): the sender sits
            # at target - (dx, dy), so dx=+1 means a west neighbor -> west
            # halo columns [0:r]; dy=+1 means a south neighbor (lower
            # tile_y = further south = lower canvas rows) -> south halo
            # rows [r+TILE_PX:].  Tiles with no center message are mosaic
            # positions we only received halos for — skip them.
            if not any(m[0] == 0 and m[1] == 0 for m in msgs):
                return None
            var, level, tx, ty = cur_key
            P = np.zeros((pad, pad), dtype=np.int64)
            n_halo = 0
            for dx, dy, w, h, buf in msgs:
                block = np.frombuffer(buf, dtype=np.uint16).reshape(h, w)
                c0 = 0 if dx == 1 else (r + TILE_PX if dx == -1 else r)
                r0 = r + TILE_PX if dy == 1 else (0 if dy == -1 else r)
                P[r0 : r0 + h, c0 : c0 + w] = block
                if not (dx == 0 and dy == 0):
                    n_halo += 1
            rec = {
                "var": str(var),
                "level": int(level),
                "tile_x": int(tx),
                "tile_y": int(ty),
                "n_halo": n_halo,
            }
            rec.update(compute(P, n_halo))
            return rec

        out: list[dict] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                key = (row.var, row.level, row.tile_x, row.tile_y)
                if key != cur_key:
                    if cur_key is not None and (rec := emit()) is not None:
                        out.append(rec)
                    cur_key, msgs = key, []
                msgs.append((row.dx, row.dy, row.strip_w, row.strip_h, row.data))
                if len(out) >= 64:
                    yield pd.DataFrame.from_records(out)
                    out = []
        if cur_key is not None and (rec := emit()) is not None:
            out.append(rec)
        if out:
            yield pd.DataFrame.from_records(out)
        elif cur_key is None:
            yield pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in out_schema.fields}
            )

    return keyed.mapInPandas(assemble_stream, out_schema)


def focal_stats(tiles: DataFrame, radius: int = 1) -> DataFrame:
    """Per-pixel box-mean over each tile canvas with true cross-tile halos.

    ``tiles``: ``merge_tiles`` output (any mix of levels; the tile key
    includes ``level`` so pyramids pass through unmixed).  Returns one row
    per input tile: the float32 focal-mean canvas (row-major ``data``),
    the number of neighbor strips received (``n_halo``, 0..8), and the
    canvas' focal sum / min / max.

    Mean semantics: constant divisor ``(2r+1)^2`` with zero padding
    outside the stored mosaic — identical to ``numpy`` convolution of the
    zero-padded global mosaic, which is what the tests compare against.
    """
    k = 2 * radius + 1

    def compute(P: np.ndarray, n_halo: int) -> dict:
        win = np.lib.stride_tricks.sliding_window_view(P, (k, k))
        sums = win.sum(axis=(2, 3))
        mean = (sums / float(k * k)).astype(np.float32)
        return {
            "data": mean.tobytes(),
            "focal_sum": float(mean.astype(np.float64).sum()),
            "focal_min": float(mean.min()),
            "focal_max": float(mean.max()),
        }

    return halo_exchange(tiles, radius, compute, _FOCAL_SCHEMA.fields[5:])
