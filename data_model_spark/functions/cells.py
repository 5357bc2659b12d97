"""Hierarchical spatial cell index ("zcell") — the engine's H3/S2 analogue.

Neither ``h3`` nor ``s2geometry`` is available in this environment, so the
engine ships its own deterministic hierarchical grid with the same algebra
the north rule needs: ``cell_of(lon, lat, res)``, ``k_ring``, ``parent``,
``polygon_cover``.  Design: at resolution ``r`` the lon/lat plane is split
into ``2^r x 2^r`` rectangular cells; a cell id packs ``(res, y, x)`` into a
single int64 (``res`` in bits 56..62, ``y`` in 28..55, ``x`` in 0..27), so
cell ids are join keys, parents are two bit-shifts, and k-rings are integer
neighborhoods — all vectorizable in NumPy inside pandas UDFs.

Max resolution 28 (cell ~2.4 m of longitude at the equator at res 24;
sub-meter by res 28) — comparable in reach to H3 res 15 / S2 level 30.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 28
_RES_SHIFT = 56
_Y_SHIFT = 28
_XY_MASK = (1 << 28) - 1


def cell_id(res: int, x, y):
    """Pack (res, x, y) tile indices into int64 cell ids (vectorized)."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    return (np.int64(res) << _RES_SHIFT) | (y << _Y_SHIFT) | x


def cell_res(cell):
    return (np.asarray(cell, dtype=np.int64) >> _RES_SHIFT) & 0x7F


def cell_xy(cell):
    c = np.asarray(cell, dtype=np.int64)
    return c & _XY_MASK, (c >> _Y_SHIFT) & _XY_MASK


def cell_of(lon, lat, res: int):
    """Cell id containing each lon/lat point at resolution ``res``."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"res must be in [0, {MAX_RES}]")
    n = np.int64(1) << res
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    fx = (lon + 180.0) / 360.0
    fy = (lat + 90.0) / 180.0
    x = np.clip((fx * n).astype(np.int64), 0, n - 1)
    y = np.clip((fy * n).astype(np.int64), 0, n - 1)
    return cell_id(res, x, y)


def cell_bounds(cell):
    """(lon_min, lat_min, lon_max, lat_max) of each cell (vectorized)."""
    c = np.asarray(cell, dtype=np.int64)
    res = cell_res(c)
    x, y = cell_xy(c)
    n = (np.int64(1) << res).astype(np.float64)
    lon_min = x / n * 360.0 - 180.0
    lat_min = y / n * 180.0 - 90.0
    return lon_min, lat_min, lon_min + 360.0 / n, lat_min + 180.0 / n


def parent(cell, steps: int = 1):
    """Parent cell ``steps`` resolutions up."""
    c = np.asarray(cell, dtype=np.int64)
    res = cell_res(c)
    x, y = cell_xy(c)
    return cell_id(int(np.max(res)) - steps, x >> steps, y >> steps)


def children(cell_scalar: int) -> np.ndarray:
    """The four child cells one resolution down (scalar in, 4 ids out)."""
    res = int(cell_res(cell_scalar))
    if res >= MAX_RES:
        # child x/y would need res+1 bits and bleed across the packed
        # 28-bit fields, silently producing colliding ids
        raise ValueError(f"cannot subdivide below res {MAX_RES}")
    x, y = (int(v) for v in cell_xy(cell_scalar))
    xs = np.array([2 * x, 2 * x + 1, 2 * x, 2 * x + 1], dtype=np.int64)
    ys = np.array([2 * y, 2 * y, 2 * y + 1, 2 * y + 1], dtype=np.int64)
    return cell_id(res + 1, xs, ys)


def k_ring(cell_scalar: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance ``k`` (lon wraps, lat clamps)."""
    res = int(cell_res(cell_scalar))
    x, y = (int(v) for v in cell_xy(cell_scalar))
    n = 1 << res
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    xs = np.mod(x + dx.ravel(), n)
    ys = y + dy.ravel()
    valid = (ys >= 0) & (ys < n)
    return np.unique(cell_id(res, xs[valid], ys[valid]))


def k_ring_many(cells, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-ring for an array of same-resolution cells.

    Returns ``(src_index, ring_cell)`` pairs suitable for building an
    exploded candidate DataFrame (one row per (input cell, neighbor)).
    """
    c = np.asarray(cells, dtype=np.int64)
    if c.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    res = int(cell_res(c[0]))
    n = 1 << res
    x, y = cell_xy(c)
    side = 2 * k + 1
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    dx, dy = dx.ravel(), dy.ravel()
    xs = np.mod(x[:, None] + dx[None, :], n)
    ys = y[:, None] + dy[None, :]
    src = np.repeat(np.arange(c.size), side * side)
    xs, ys = xs.ravel(), ys.ravel()
    valid = (ys >= 0) & (ys < n)
    return src[valid], cell_id(res, xs[valid], ys[valid])


def bbox_cover(lon_min, lat_min, lon_max, lat_max, res: int) -> np.ndarray:
    """All cells at ``res`` intersecting the lon/lat bbox (scalar bbox)."""
    n = np.int64(1) << res
    x0 = int(np.clip(np.floor((lon_min + 180.0) / 360.0 * n), 0, n - 1))
    x1 = int(np.clip(np.floor((lon_max + 180.0) / 360.0 * n), 0, n - 1))
    y0 = int(np.clip(np.floor((lat_min + 90.0) / 180.0 * n), 0, n - 1))
    y1 = int(np.clip(np.floor((lat_max + 90.0) / 180.0 * n), 0, n - 1))
    xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return cell_id(res, xs.ravel(), ys.ravel())


def polygon_cover(poly_lonlat: np.ndarray, res: int, exact: bool = True) -> np.ndarray:
    """Cells at ``res`` covering a polygon (Nx2 lon/lat ring, not closed).

    ``exact=False`` returns the bbox cover (a cheap superset — sufficient for
    join candidate generation, PIP refinement restores exactness).
    ``exact=True`` keeps only cells whose rectangle intersects the polygon.
    """
    from . import geometry

    poly = np.asarray(poly_lonlat, dtype=np.float64)
    lon_min, lat_min = poly.min(axis=0)
    lon_max, lat_max = poly.max(axis=0)
    cand = bbox_cover(lon_min, lat_min, lon_max, lat_max, res)
    if not exact or cand.size == 0:
        return cand
    lo_x, lo_y, hi_x, hi_y = cell_bounds(cand)
    keep = geometry.rects_intersect_polygon(lo_x, lo_y, hi_x, hi_y, poly)
    return cand[keep]


def compact_cover(cover, min_res: int) -> np.ndarray:
    """Hierarchical cover compaction (H3 ``compact`` analogue, NumPy oracle).

    Input: unique same-resolution cells.  Any complete sibling quad (all 4
    children of one parent present) is replaced by the parent, repeatedly,
    until ``min_res``.  The result covers exactly the same area with the
    minimum number of mixed-resolution cells (uniqueness of the greedy
    bottom-up merge).  Distributed twin: ``operators.spatial.compact_cover_df``.
    """
    c = np.unique(np.asarray(cover, dtype=np.int64))
    if c.size == 0:
        return c
    res = int(cell_res(c[0]))
    if not (0 <= min_res <= res):
        raise ValueError(f"min_res must be in [0, {res}]")
    out: list[np.ndarray] = []
    for _ in range(res, min_res, -1):
        if c.size == 0:
            break
        par = parent(c)
        uniq, counts = np.unique(par, return_counts=True)
        promoted = uniq[counts == 4]
        keep = ~np.isin(par, promoted)
        out.append(c[keep])
        c = promoted
    out.append(c)
    return np.concatenate(out)


def uncompact_cover(cover, res: int) -> np.ndarray:
    """Expand a mixed-resolution cover to uniform ``res`` cells (inverse of
    ``compact_cover``: uncompact(compact(S)) == S for unique input S)."""
    c = np.asarray(cover, dtype=np.int64)
    done: list[np.ndarray] = []
    while c.size:
        r = cell_res(c)
        if np.any(r > res):
            raise ValueError("cover contains cells finer than target res")
        at = c[r == res]
        if at.size:
            done.append(at)
        coarse = c[r < res]
        c = (
            np.concatenate([children(int(cc)) for cc in coarse])
            if coarse.size
            else np.empty(0, np.int64)
        )
    return np.unique(np.concatenate(done)) if done else np.empty(0, np.int64)


def mask_boundary(mask, res: int) -> np.ndarray:
    """Rook-neighborhood boundary of a cell mask (NumPy oracle).

    A cell is boundary iff any of its 4 edge neighbors is absent from the
    mask; longitude wraps mod ``2^res``, latitude clamps (off-grid counts
    as absent).  Distributed twin: ``operators.spatial.mask_boundary_cells``.
    """
    m = np.unique(np.asarray(mask, dtype=np.int64))
    if m.size == 0:
        return m
    n = 1 << res
    have = set(int(v) for v in m)
    x, y = cell_xy(m)
    out = []
    for cx, cy, c in zip(x, y, m):
        nbrs = [((cx + 1) % n, cy), ((cx - 1) % n, cy), (cx, cy + 1), (cx, cy - 1)]
        for nx, ny in nbrs:
            if not (0 <= ny < n) or int(cell_id(res, nx, ny)) not in have:
                out.append(c)
                break
    return np.asarray(out, dtype=np.int64)


def cover_resolution_for_extent(extent_deg: float, target_cells: int = 16) -> int:
    """Pick a resolution where the extent covers ~``target_cells`` cells in
    TOTAL (~sqrt(target_cells) per axis)."""
    if extent_deg <= 0:
        return MAX_RES
    import math

    res = int(math.floor(math.log2(360.0 * math.sqrt(target_cells) / extent_deg / 1.0)))
    return max(0, min(MAX_RES, res))
