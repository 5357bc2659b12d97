"""Sequential direct-kernel replays of the synthetic image -> level-0
merged-tile mosaic, shared by the ``*_fp`` oracle twins.

The ``zonal_stats_fp`` pattern (VERDICT r4 #5): a rows-only pixel query
gets a driver-visible oracle by replaying the SAME input deterministically
with plain NumPy (no engine cut/merge code) and emitting the expected rows
as a DuckDB VALUES literal.  This module holds the replay of the input
side — the level-0 canvases ``tiling.build_tiles`` + ``merge_tiles``
produce for the first N synthetic scenes (reference write path:
``src/eopf_geozarr/conversion/geozarr.py``) — by direct floor-arithmetic
placement, plus the halo/mosaic assembly helpers the individual twins
build their expected fingerprints from.

The placement replay was proven hash-equal to the engine's merge output
by the ``zonal_stats_fp`` green row; it is factored here verbatim so
every new twin inherits that evidence.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

TILE_PX, PX_M = 256, 10

# 8-neighbor tile offsets: (dtx, dty) -> (halo slot in a 1-px padded
# canvas, strip slice of the NEIGHBOR's canvas).  Canvas rows run
# southward (row 0 = north edge, adjoins tile_y + 1) — the
# ``focal.halo_exchange`` contract.
_NEIGHBOR_STRIPS: list[tuple[int, int]] = [
    (dtx, dty) for dtx in (-1, 0, 1) for dty in (-1, 0, 1) if (dtx, dty) != (0, 0)
]


def placements(n_images: int, with_index: bool = False):
    """Yield every level-0 scene->tile fragment placement of the first
    ``n_images`` synthetic scenes: (var, tile_x, tile_y, oy, ox, block)
    with ``block`` the codec-roundtripped uint16 pixel window landing at
    canvas[oy:oy+bh, ox:ox+bw].  Scenes stream in ascending index — the
    merge overwrite order.  ``with_index=True`` prepends the scene index
    ``i`` (needed by replays whose kernel is scene-dependent, e.g. the
    feather-blend weights)."""
    from ..codecs import decode_image, encode_image
    from ..sources import images as img_src

    tile_m = TILE_PX * PX_M
    for i in range(n_images):
        w, h = img_src.image_dims(i)
        var = img_src.band_for(i)
        fmt = img_src.image_fmt(i)
        raw = img_src.synth_pixels(f"img_{i:012d}", w, h)
        dec = decode_image(encode_image(raw, fmt), fmt, w, h)
        ax, ay = img_src.scene_anchor(i)
        top = ay + h * PX_M
        for ty in range(
            math.floor((top - h * PX_M + 1e-9) / tile_m),
            math.floor((top - 1e-9) / tile_m) + 1,
        ):
            for tx in range(
                math.floor(ax / tile_m),
                math.floor((ax + w * PX_M - 1e-9) / tile_m) + 1,
            ):
                t_left, t_top = tx * tile_m, (ty + 1) * tile_m
                c0 = max(0, round((t_left - ax) / PX_M))
                c1 = min(w, round((t_left + tile_m - ax) / PX_M))
                r0 = max(0, round((top - t_top) / PX_M))
                r1 = min(h, round((top - (t_top - tile_m)) / PX_M))
                if c1 <= c0 or r1 <= r0:
                    continue
                oy = r0 + round((t_top - top) / PX_M)
                ox = c0 + round((ax - t_left) / PX_M)
                if with_index:
                    yield i, var, tx, ty, oy, ox, dec[r0:r1, c0:c1]
                else:
                    yield var, tx, ty, oy, ox, dec[r0:r1, c0:c1]


@lru_cache(maxsize=4)
def merged_canvases(n_images: int) -> dict[tuple, np.ndarray]:
    """{(var, tile_x, tile_y): uint16 (256, 256)} — level-0 merged canvases
    of the first ``n_images`` synthetic scenes.  Treat as read-only (the
    cache shares the dict across callers)."""
    canvases: dict[tuple, np.ndarray] = {}
    for var, tx, ty, oy, ox, block in placements(n_images):
        cv = canvases.setdefault(
            (var, tx, ty), np.zeros((TILE_PX, TILE_PX), np.uint16)
        )
        cv[oy : oy + block.shape[0], ox : ox + block.shape[1]] = block
    return canvases


def n_halo(canvases: dict[tuple, np.ndarray], var: str, tx: int, ty: int) -> int:
    """Number of stored 8-neighbors — the strip count ``halo_exchange``
    reports as ``n_halo``."""
    return sum(
        (var, tx + dtx, ty + dty) in canvases for dtx, dty in _NEIGHBOR_STRIPS
    )


def padded(
    canvases: dict[tuple, np.ndarray], var: str, tx: int, ty: int
) -> np.ndarray:
    """(258, 258) int64 canvas with 1-px halos from stored neighbors,
    zeros outside the stored mosaic — what ``halo_exchange`` hands the
    stencil kernels at radius 1."""
    n = TILE_PX
    P = np.zeros((n + 2, n + 2), dtype=np.int64)
    P[1:-1, 1:-1] = canvases[(var, tx, ty)]
    # rows run southward: tile_y + 1 is NORTH (canvas row 0 side)
    if (w := canvases.get((var, tx - 1, ty))) is not None:
        P[1:-1, 0] = w[:, n - 1]
    if (e := canvases.get((var, tx + 1, ty))) is not None:
        P[1:-1, n + 1] = e[:, 0]
    if (no := canvases.get((var, tx, ty + 1))) is not None:
        P[0, 1:-1] = no[n - 1, :]
    if (s := canvases.get((var, tx, ty - 1))) is not None:
        P[n + 1, 1:-1] = s[0, :]
    if (nw := canvases.get((var, tx - 1, ty + 1))) is not None:
        P[0, 0] = nw[n - 1, n - 1]
    if (ne := canvases.get((var, tx + 1, ty + 1))) is not None:
        P[0, n + 1] = ne[n - 1, 0]
    if (sw := canvases.get((var, tx - 1, ty - 1))) is not None:
        P[n + 1, 0] = sw[0, n - 1]
    if (se := canvases.get((var, tx + 1, ty - 1))) is not None:
        P[n + 1, n + 1] = se[0, 0]
    return P


def var_mosaic(canvases: dict[tuple, np.ndarray], var: str):
    """(G, tiles, origin) — the var's bounding-rectangle global mosaic.

    Positions with no stored tile are zero-filled over the FULL
    ``min..max`` tile ranges (NOT compacted sorted-distinct indices), so
    tile adjacency in G matches the engine's key-based halo/flux
    adjacency exactly even when the stored set has gaps.  ``tiles`` is
    the stored (tx, ty) list; ``origin`` = (tx_min, ty_max) maps a tile
    to its G block: rows = (ty_max - ty) * 256, cols = (tx - tx_min)
    * 256 (row 0 of G is the NORTH edge of tile row ty_max).
    """
    tiles = [(tx, ty) for (v, tx, ty) in canvases if v == var]
    txs = [t[0] for t in tiles]
    tys = [t[1] for t in tiles]
    tx_min, tx_max = min(txs), max(txs)
    ty_min, ty_max = min(tys), max(tys)
    n = TILE_PX
    G = np.zeros(((ty_max - ty_min + 1) * n, (tx_max - tx_min + 1) * n), np.uint16)
    for tx, ty in tiles:
        r0 = (ty_max - ty) * n
        c0 = (tx - tx_min) * n
        G[r0 : r0 + n, c0 : c0 + n] = canvases[(var, tx, ty)]
    return G, tiles, (tx_min, ty_max)


def tile_block(G: np.ndarray, origin: tuple[int, int], tx: int, ty: int):
    """The (row, col) slice of ``var_mosaic``'s G holding tile (tx, ty)."""
    tx_min, ty_max = origin
    n = TILE_PX
    r0 = (ty_max - ty) * n
    c0 = (tx - tx_min) * n
    return G[r0 : r0 + n, c0 : c0 + n]


def mosaic_vars(canvases: dict[tuple, np.ndarray]) -> list[str]:
    return sorted({v for (v, _, _) in canvases})


@lru_cache(maxsize=4)
def merged_canvases_at(n_images: int, level: int) -> dict[tuple, np.ndarray]:
    """{(var, tile_x, tile_y): uint16 (256, 256)} — the LEVEL-``level``
    merged canvases of the first ``n_images`` synthetic scenes.

    Sequential replay of the engine's per-image level cut
    (``tiling.py:107-183``): the /2 sum-quad cascade for reflectance
    bands on cleanly-halving dims, the type-dispatched direct
    ``downsample`` otherwise, then floor-arithmetic placement on the
    level grid (pixel = PX_M * 2^level) in ascending-scene overwrite
    order.  ``merged_canvases_at(n, 0) == merged_canvases(n)`` by
    construction (level 0 takes the decoded image verbatim).
    """
    from ..codecs import decode_image, encode_image
    from ..functions import gridlib
    from ..sources import images as img_src
    from .downsample import downsample, variable_type

    px = PX_M * (1 << level)
    tile_m = TILE_PX * px
    canvases: dict[tuple, np.ndarray] = {}
    for i in range(n_images):
        w, h = img_src.image_dims(i)
        var = img_src.band_for(i)
        fmt = img_src.image_fmt(i)
        raw = img_src.synth_pixels(f"img_{i:012d}", w, h)
        dec = decode_image(encode_image(raw, fmt), fmt, w, h)
        ax, ay = img_src.scene_anchor(i)
        top = ay + h * PX_M
        level_dims = [
            (lv["level"], lv["width"], lv["height"])
            for lv in gridlib.overview_levels(w, h, min_dimension=64)
        ]
        if level not in [d[0] for d in level_dims]:
            continue
        cascade_ok = variable_type(var) == "reflectance"
        acc = arr = None
        prev_lw = prev_lh = None
        lw = lh = 0
        for lv, lw, lh in level_dims:
            if lv > level:
                break
            if lw == 0 or lh == 0:
                continue
            if lv == 0:
                arr = dec
                acc = dec.astype(np.int64)
            elif cascade_ok and acc is not None and prev_lw == 2 * lw and prev_lh == 2 * lh:
                acc = acc.reshape(lh, 2, lw, 2).sum(axis=(1, 3), dtype=np.int64)
                arr = (acc / 4.0**lv).astype(dec.dtype)
            else:
                acc = None
                arr = downsample(dec, lh, lw, var)
            prev_lw, prev_lh = lw, lh
            if lv == level:
                break
        if arr is None or arr.shape != (lh, lw):
            continue
        left = anchor_left = ax
        tx0 = math.floor(anchor_left / tile_m)
        tx1 = math.floor((anchor_left + lw * px - 1e-9) / tile_m)
        ty0 = math.floor((top - lh * px + 1e-9) / tile_m)
        ty1 = math.floor((top - 1e-9) / tile_m)
        for ty in range(ty0, ty1 + 1):
            for tx in range(tx0, tx1 + 1):
                t_left, t_top = tx * tile_m, (ty + 1) * tile_m
                c0 = max(0, round((t_left - left) / px))
                c1 = min(lw, round((t_left + tile_m - left) / px))
                r0 = max(0, round((top - t_top) / px))
                r1 = min(lh, round((top - (t_top - tile_m)) / px))
                if c1 <= c0 or r1 <= r0:
                    continue
                oy = r0 + round((t_top - top) / px)
                ox = c0 + round((left - t_left) / px)
                cv = canvases.setdefault(
                    (var, tx, ty), np.zeros((TILE_PX, TILE_PX), np.uint16)
                )
                cv[oy : oy + (r1 - r0), ox : ox + (c1 - c0)] = arr[r0:r1, c0:c1]
    return canvases
