"""Vectorized planar geometry kernels (NumPy; shapely not available).

Point-in-polygon uses the classic even-odd ray-casting algorithm with the
half-open edge rule (a point exactly on a lower/left edge is inside, on an
upper/right edge outside) so that tiling assignments are exclusive-exhaustive
across adjacent tiles.  All kernels take arrays and run batched inside
pandas UDFs — no per-row Python (input_hint requirement).
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(px, py, poly: np.ndarray) -> np.ndarray:
    """Even-odd ray casting: bool mask of points inside the polygon ring.

    ``poly`` is an (N, 2) open ring (first vertex not repeated).  Vectorized
    over points AND edges: O(P*E) elementwise ops, no Python loops over rows.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = np.roll(x1, -1), np.roll(y1, -1)

    # edge straddles the horizontal ray through py (half-open in y)
    py_ = py[:, None]
    px_ = px[:, None]
    cond = (y1[None, :] <= py_) != (y2[None, :] <= py_)
    with np.errstate(divide="ignore", invalid="ignore"):
        x_int = x1[None, :] + (py_ - y1[None, :]) / (y2[None, :] - y1[None, :]) * (
            x2[None, :] - x1[None, :]
        )
    crossings = cond & (px_ < x_int)
    return crossings.sum(axis=1) % 2 == 1


def points_in_polygons(px, py, polys: list[np.ndarray]) -> np.ndarray:
    """(P, K) bool matrix: point i inside polygon k."""
    out = np.empty((len(np.asarray(px)), len(polys)), dtype=bool)
    for k, poly in enumerate(polys):
        out[:, k] = points_in_polygon(px, py, poly)
    return out


def _segments_cross(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    """Proper-intersection test for segment arrays (broadcast over pairs)."""

    def orient(ox, oy, px, py, qx, qy):
        return np.sign((px - ox) * (qy - oy) - (py - oy) * (qx - ox))

    d1 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d2 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    d3 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d4 = orient(bx1, by1, bx2, by2, ax2, ay2)
    return (d1 * d2 < 0) & (d3 * d4 < 0)


def rects_intersect_polygon(lo_x, lo_y, hi_x, hi_y, poly: np.ndarray) -> np.ndarray:
    """Bool mask: axis-aligned rect i intersects the polygon.

    True iff any rect corner is inside the polygon, any polygon vertex is
    inside the rect, or any rect edge properly crosses any polygon edge.
    Used to refine bbox cell covers to exact covers.
    """
    lo_x = np.asarray(lo_x, dtype=np.float64)
    lo_y = np.asarray(lo_y, dtype=np.float64)
    hi_x = np.asarray(hi_x, dtype=np.float64)
    hi_y = np.asarray(hi_y, dtype=np.float64)
    poly = np.asarray(poly, dtype=np.float64)
    n = lo_x.size

    # any polygon vertex inside rect
    vx, vy = poly[:, 0], poly[:, 1]
    vert_in = (
        (vx[None, :] >= lo_x[:, None])
        & (vx[None, :] <= hi_x[:, None])
        & (vy[None, :] >= lo_y[:, None])
        & (vy[None, :] <= hi_y[:, None])
    ).any(axis=1)

    # any rect corner inside polygon
    corners_x = np.stack([lo_x, hi_x, lo_x, hi_x], axis=1).ravel()
    corners_y = np.stack([lo_y, lo_y, hi_y, hi_y], axis=1).ravel()
    corner_in = points_in_polygon(corners_x, corners_y, poly).reshape(n, 4).any(axis=1)

    out = vert_in | corner_in
    todo = ~out
    if todo.any():
        # rect edges x polygon edges (only for undecided rects)
        px1, py1 = poly[:, 0], poly[:, 1]
        px2, py2 = np.roll(px1, -1), np.roll(py1, -1)
        lx, ly, hx, hy = lo_x[todo], lo_y[todo], hi_x[todo], hi_y[todo]
        rect_edges = [
            (lx, ly, hx, ly),
            (hx, ly, hx, hy),
            (hx, hy, lx, hy),
            (lx, hy, lx, ly),
        ]
        cross = np.zeros(lx.size, dtype=bool)
        for ax1, ay1, ax2, ay2 in rect_edges:
            cross |= _segments_cross(
                ax1[:, None],
                ay1[:, None],
                ax2[:, None],
                ay2[:, None],
                px1[None, :],
                py1[None, :],
                px2[None, :],
                py2[None, :],
            ).any(axis=1)
        out[todo] = cross
    return out


def polygons_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    """Exact intersects test for two simple polygon rings.

    True iff any vertex of ``a`` lies inside ``b`` (even-odd rule), any
    vertex of ``b`` lies inside ``a``, or any edge of ``a`` properly
    crosses any edge of ``b``.  Covers containment both ways, partial
    overlap, and pierce-through shapes.  Boundary-touching-only contact
    generally reports True (OGC ST_Intersects semantics: touches count),
    with the exact attribution of boundary points following the engine's
    half-open even-odd rule — a shared-edge vertex lands on the included
    half of the neighbor's boundary.  Vectorized over edges: O(Ea*Eb)
    elementwise ops, no Python loops.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if points_in_polygon(a[:, 0], a[:, 1], b).any():
        return True
    if points_in_polygon(b[:, 0], b[:, 1], a).any():
        return True
    ax1, ay1 = a[:, 0], a[:, 1]
    ax2, ay2 = np.roll(ax1, -1), np.roll(ay1, -1)
    bx1, by1 = b[:, 0], b[:, 1]
    bx2, by2 = np.roll(bx1, -1), np.roll(by1, -1)
    return bool(
        _segments_cross(
            ax1[:, None], ay1[:, None], ax2[:, None], ay2[:, None],
            bx1[None, :], by1[None, :], bx2[None, :], by2[None, :],
        ).any()
    )


def polygon_bbox(poly: np.ndarray) -> tuple[float, float, float, float]:
    p = np.asarray(poly, dtype=np.float64)
    return float(p[:, 0].min()), float(p[:, 1].min()), float(p[:, 0].max()), float(p[:, 1].max())


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area (absolute)."""
    p = np.asarray(poly, dtype=np.float64)
    x, y = p[:, 0], p[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0)


def bbox_union(bboxes: np.ndarray) -> tuple[float, float, float, float]:
    """Union of (N, 4) [xmin, ymin, xmax, ymax] rows (min/min/max/max)."""
    b = np.asarray(bboxes, dtype=np.float64).reshape(-1, 4)
    return (
        float(b[:, 0].min()),
        float(b[:, 1].min()),
        float(b[:, 2].max()),
        float(b[:, 3].max()),
    )
