"""GCP-based reprojection (warp) kernels — pure NumPy, driver/UDF-side.

Reimplements the semantics of the reference's Sentinel-1 GCP reprojection
(`conversion/sentinel1_reprojection.py:20-108` — build GCPs, compute a
target EPSG:4326 grid, per-band bilinear ``rasterio.warp.reproject`` with
nodata preservation) without GDAL: the inverse mapping
(lon, lat) -> (line, pixel) is a least-squares polynomial fit over the GCP
grid (order 1 = affine, the exact model for the reference's linear test
fixture `tests/test_integration_sentinel1.py:84-97`; orders 2-3 available
for curved geometries), and sampling is nodata-preserving bilinear.

Everything is vectorized over whole output grids; the Spark layer
(`operators/reproject.py`) calls these inside ``applyInPandas`` per scene —
the per-band granularity the reference parallelizes at.
"""

from __future__ import annotations

import numpy as np

# term exponents (i, j) for lon^i * lat^j per polynomial order
_TERMS = {
    1: [(0, 0), (1, 0), (0, 1)],
    2: [(0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2)],
    3: [
        (0, 0), (1, 0), (0, 1), (2, 0), (1, 1), (0, 2),
        (3, 0), (2, 1), (1, 2), (0, 3),
    ],
}


def _design_matrix(lon: np.ndarray, lat: np.ndarray, order: int) -> np.ndarray:
    lon = np.asarray(lon, dtype=np.float64).ravel()
    lat = np.asarray(lat, dtype=np.float64).ravel()
    return np.column_stack([lon**i * lat**j for i, j in _TERMS[order]])


def fit_gcp_inverse(
    line: np.ndarray,
    pixel: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    order: int = 1,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Least-squares fit of the inverse map (lon, lat) -> (line, pixel).

    Returns (coef_line, coef_pixel, rms) where rms is the max of the two
    fit residual RMS values in source-pixel units — callers can assert the
    GCP geometry is adequately modeled (0 for affine geometries at order 1).
    """
    if order not in _TERMS:
        raise ValueError(f"order must be one of {sorted(_TERMS)}")
    a = _design_matrix(lon, lat, order)
    line = np.asarray(line, dtype=np.float64).ravel()
    pixel = np.asarray(pixel, dtype=np.float64).ravel()
    if a.shape[0] < a.shape[1]:
        raise ValueError(f"need >= {a.shape[1]} GCPs for order {order}, got {a.shape[0]}")
    cl, res_l, *_ = np.linalg.lstsq(a, line, rcond=None)
    cp, res_p, *_ = np.linalg.lstsq(a, pixel, rcond=None)
    pred_l = a @ cl
    pred_p = a @ cp
    rms = max(
        float(np.sqrt(np.mean((pred_l - line) ** 2))),
        float(np.sqrt(np.mean((pred_p - pixel) ** 2))),
    )
    return cl, cp, rms


def eval_gcp_inverse(
    coef_line: np.ndarray,
    coef_pixel: np.ndarray,
    lon: np.ndarray,
    lat: np.ndarray,
    order: int = 1,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized inverse map: arrays of (lon, lat) -> fractional (line, pixel)."""
    a = _design_matrix(lon, lat, order)
    shape = np.asarray(lon).shape
    return (a @ coef_line).reshape(shape), (a @ coef_pixel).reshape(shape)


def target_grid_from_gcps(
    lat: np.ndarray,
    lon: np.ndarray,
    out_width: int,
    out_height: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Regular EPSG:4326 output grid covering the GCP bbox.

    x (lon) ascending, y (lat) DESCENDING — the reference's coordinate
    convention (`conversion/sentinel1_reprojection.py:141-178`,
    `geozarr.py:886-910`: north-up rasters have negative y pixel size).
    Cell-center coordinates with half-pixel inset, endpoint-exclusive
    linspace like the reference's ``np.linspace(..., endpoint=False)``.
    """
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    lon0, lon1 = float(lon.min()), float(lon.max())
    lat0, lat1 = float(lat.min()), float(lat.max())
    dx = (lon1 - lon0) / out_width
    dy = (lat1 - lat0) / out_height
    lons = lon0 + dx * (np.arange(out_width) + 0.5)
    lats = lat1 - dy * (np.arange(out_height) + 0.5)
    return lons, lats


def bilinear_sample(
    src: np.ndarray,
    line_f: np.ndarray,
    pixel_f: np.ndarray,
    nodata: float,
) -> np.ndarray:
    """Nodata-preserving bilinear sampling at fractional (line, pixel).

    Semantics (matching the reference's warp contract,
    `sentinel1_reprojection.py:277-329`): outside the source extent ->
    nodata; if ANY of the four contributing neighbors equals nodata, the
    output is nodata (no partial blending across nodata boundaries).
    Output dtype is float64; callers cast back (the reference restores the
    source dtype after warping, `sentinel1_reprojection.py:217-274`).
    """
    src = np.asarray(src)
    h, w = src.shape
    lf = np.asarray(line_f, dtype=np.float64)
    pf = np.asarray(pixel_f, dtype=np.float64)

    inb = (lf >= 0) & (lf <= h - 1) & (pf >= 0) & (pf <= w - 1)
    l0 = np.clip(np.floor(lf).astype(np.int64), 0, h - 1)
    p0 = np.clip(np.floor(pf).astype(np.int64), 0, w - 1)
    l1 = np.minimum(l0 + 1, h - 1)
    p1 = np.minimum(p0 + 1, w - 1)
    wl = np.clip(lf - l0, 0.0, 1.0)
    wp = np.clip(pf - p0, 0.0, 1.0)

    v00 = src[l0, p0].astype(np.float64)
    v01 = src[l0, p1].astype(np.float64)
    v10 = src[l1, p0].astype(np.float64)
    v11 = src[l1, p1].astype(np.float64)

    w00 = (1 - wl) * (1 - wp)
    w01 = (1 - wl) * wp
    w10 = wl * (1 - wp)
    w11 = wl * wp
    if np.isnan(nodata):
        is_nd = [np.isnan(v) for v in (v00, v01, v10, v11)]
    else:
        is_nd = [v == nodata for v in (v00, v01, v10, v11)]
    # only CONTRIBUTING neighbors poison the cell: a zero-weight corner
    # (exactly on-grid sample next to nodata) must not mask valid data
    bad = (
        (is_nd[0] & (w00 > 0))
        | (is_nd[1] & (w01 > 0))
        | (is_nd[2] & (w10 > 0))
        | (is_nd[3] & (w11 > 0))
    )

    out = (
        v00 * (1 - wl) * (1 - wp)
        + v01 * (1 - wl) * wp
        + v10 * wl * (1 - wp)
        + v11 * wl * wp
    )
    out = np.where(inb & ~bad, out, np.float64(nodata))
    return out


def warp_gcp(
    src: np.ndarray,
    gcp_line: np.ndarray,
    gcp_pixel: np.ndarray,
    gcp_lat: np.ndarray,
    gcp_lon: np.ndarray,
    out_width: int | None = None,
    out_height: int | None = None,
    nodata: float = 0.0,
    order: int = 1,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Warp a 2-D source array to a regular EPSG:4326 grid via its GCPs.

    Returns (warped[h, w] float64, lons[w], lats[h]).  Output dims default
    to the source dims (deterministic stand-in for rasterio's
    ``calculate_default_transform``, `sentinel1_reprojection.py:69-77` —
    same pixel count, bbox from the GCP extremes).
    """
    h, w = np.asarray(src).shape
    out_width = int(out_width or w)
    out_height = int(out_height or h)
    cl, cp, _rms = fit_gcp_inverse(gcp_line, gcp_pixel, gcp_lat, gcp_lon, order)
    lons, lats = target_grid_from_gcps(gcp_lat, gcp_lon, out_width, out_height)
    lon_m, lat_m = np.meshgrid(lons, lats)
    line_f, pixel_f = eval_gcp_inverse(cl, cp, lon_m, lat_m, order)
    return bilinear_sample(src, line_f, pixel_f, nodata), lons, lats


def default_nodata(dtype) -> float:
    """Reference nodata defaults by dtype (`sentinel1_reprojection.py:181-214`).

    Single source of truth lives in gridlib (same policy governs grid
    metadata and warp fill); re-exported here for the warp API surface.
    """
    from .gridlib import default_nodata as _gd

    return float(_gd(dtype))
