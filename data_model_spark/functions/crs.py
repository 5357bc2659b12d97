"""Vectorized CRS kernels (pure NumPy; no pyproj available in this env).

Implements WGS84 UTM (Transverse Mercator) forward/inverse using the
published Snyder (USGS Professional Paper 1395, 1987) series — public
knowledge, accuracy ~1 cm within a zone — so the engine's CRS transforms
(reference: pyproj calls at ``s2_optimization/s2_converter.py:329-346`` and
``conversion/sentinel1_reprojection.py:360-372``) run as batched NumPy inside
pandas UDFs with no per-row Python.

EPSG parsing mirrors ``s2_optimization/s2_converter.py:26-102``:
``"EPSG:32632" | 32632 -> code``; UTM codes are 326xx (north) / 327xx (south).
"""

from __future__ import annotations

import math

import numpy as np

# WGS84 ellipsoid
A = 6378137.0
F = 1.0 / 298.257223563
E2 = F * (2.0 - F)
EP2 = E2 / (1.0 - E2)
K0 = 0.9996
FALSE_EASTING = 500000.0
FALSE_NORTHING_SOUTH = 10000000.0

_M1 = 1 - E2 / 4 - 3 * E2**2 / 64 - 5 * E2**3 / 256
_M2 = 3 * E2 / 8 + 3 * E2**2 / 32 + 45 * E2**3 / 1024
_M3 = 15 * E2**2 / 256 + 45 * E2**3 / 1024
_M4 = 35 * E2**3 / 3072


def parse_epsg(value) -> int:
    """``"EPSG:32632" | "32632" | 32632 -> 32632``."""
    if isinstance(value, int):
        return value
    s = str(value)
    if ":" in s:
        s = s.split(":")[-1]
    return int(s)


def utm_epsg(zone: int, north: bool) -> int:
    return (32600 if north else 32700) + zone


def epsg_to_utm_zone(epsg: int) -> tuple[int, bool]:
    """EPSG code -> (zone, is_north). Raises for non-UTM codes."""
    code = parse_epsg(epsg)
    if 32601 <= code <= 32660:
        return code - 32600, True
    if 32701 <= code <= 32760:
        return code - 32700, False
    raise ValueError(f"not a UTM EPSG code: {epsg}")


def central_meridian(zone: int) -> float:
    return -183.0 + 6.0 * zone


def _meridional_arc(phi: np.ndarray) -> np.ndarray:
    return A * (
        _M1 * phi
        - _M2 * np.sin(2 * phi)
        + _M3 * np.sin(4 * phi)
        - _M4 * np.sin(6 * phi)
    )


def lonlat_to_utm(lon, lat, zone: int, north: bool = True):
    """WGS84 lon/lat (degrees) -> UTM easting/northing (meters). Vectorized."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    phi = np.radians(lat)
    lam = np.radians(lon)
    lam0 = np.radians(central_meridian(zone))

    sin_phi = np.sin(phi)
    cos_phi = np.cos(phi)
    tan_phi = np.tan(phi)

    n = A / np.sqrt(1 - E2 * sin_phi**2)
    t = tan_phi**2
    c = EP2 * cos_phi**2
    a_ = (lam - lam0) * cos_phi
    m = _meridional_arc(phi)

    x = FALSE_EASTING + K0 * n * (
        a_
        + (1 - t + c) * a_**3 / 6
        + (5 - 18 * t + t**2 + 72 * c - 58 * EP2) * a_**5 / 120
    )
    y = K0 * (
        m
        + n
        * tan_phi
        * (
            a_**2 / 2
            + (5 - t + 9 * c + 4 * c**2) * a_**4 / 24
            + (61 - 58 * t + t**2 + 600 * c - 330 * EP2) * a_**6 / 720
        )
    )
    if not north:
        y = y + FALSE_NORTHING_SOUTH
    return x, y


def utm_to_lonlat(x, y, zone: int, north: bool = True):
    """UTM easting/northing (meters) -> WGS84 lon/lat (degrees). Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    y_adj = y - (0.0 if north else FALSE_NORTHING_SOUTH)

    m = y_adj / K0
    mu = m / (A * _M1)
    e1 = (1 - np.sqrt(1 - E2)) / (1 + np.sqrt(1 - E2))

    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )

    sin_phi1 = np.sin(phi1)
    cos_phi1 = np.cos(phi1)
    tan_phi1 = np.tan(phi1)

    c1 = EP2 * cos_phi1**2
    t1 = tan_phi1**2
    n1 = A / np.sqrt(1 - E2 * sin_phi1**2)
    r1 = A * (1 - E2) / (1 - E2 * sin_phi1**2) ** 1.5
    d = (x - FALSE_EASTING) / (n1 * K0)

    phi = phi1 - (n1 * tan_phi1 / r1) * (
        d**2 / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1**2 - 9 * EP2) * d**4 / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1**2 - 252 * EP2 - 3 * c1**2)
        * d**6
        / 720
    )
    lam = (
        d
        - (1 + 2 * t1 + c1) * d**3 / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1**2 + 8 * EP2 + 24 * t1**2) * d**5 / 120
    ) / cos_phi1

    lat = np.degrees(phi)
    lon = central_meridian(zone) + np.degrees(lam)
    return lon, lat


# WebMercator (EPSG:3857): spherical mercator on the WGS84 semi-major axis —
# the published closed forms (EPSG guidance note 7-2, method 1024)
WEBMERCATOR_R = 6378137.0
WEBMERCATOR_ORIGIN = math.pi * WEBMERCATOR_R  # half world width, 20037508.34m


def lonlat_to_webmercator(lon, lat):
    """EPSG:4326 -> EPSG:3857 (vectorized)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = WEBMERCATOR_R * np.radians(lon)
    y = WEBMERCATOR_R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))
    return x, y


def webmercator_to_lonlat(x, y):
    """EPSG:3857 -> EPSG:4326 (vectorized)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.degrees(x / WEBMERCATOR_R)
    lat = np.degrees(2.0 * np.arctan(np.exp(y / WEBMERCATOR_R)) - np.pi / 2.0)
    return lon, lat


def transform_points(x, y, src_epsg: int, dst_epsg: int):
    """Point CRS transform between EPSG:4326, EPSG:3857 and UTM zones
    (always_xy order); 3857<->UTM routes through lon/lat."""
    src = parse_epsg(src_epsg)
    dst = parse_epsg(dst_epsg)
    if src == 3857 or dst == 3857:
        if src == 3857:
            lon, lat = webmercator_to_lonlat(x, y)
            return transform_points(lon, lat, 4326, dst)
        lon, lat = transform_points(x, y, src, 4326)
        return lonlat_to_webmercator(lon, lat)
    return _transform_points_utm(x, y, src, dst)


def _transform_points_utm(x, y, src_epsg: int, dst_epsg: int):
    """Point CRS transform between EPSG:4326 and UTM zones (always_xy order)."""
    src = parse_epsg(src_epsg)
    dst = parse_epsg(dst_epsg)
    if src == dst:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if src == 4326:
        zone, north = epsg_to_utm_zone(dst)
        return lonlat_to_utm(x, y, zone, north)
    if dst == 4326:
        zone, north = epsg_to_utm_zone(src)
        return utm_to_lonlat(x, y, zone, north)
    # UTM -> UTM via lon/lat
    zs, ns = epsg_to_utm_zone(src)
    zd, nd = epsg_to_utm_zone(dst)
    lon, lat = utm_to_lonlat(x, y, zs, ns)
    return lonlat_to_utm(lon, lat, zd, nd)


def crs_wkt(epsg: int) -> str:
    """Minimal WKT2-ish string for the grid-mapping metadata row."""
    code = parse_epsg(epsg)
    if code == 4326:
        return 'GEOGCRS["WGS 84",ID["EPSG",4326]]'
    zone, north = epsg_to_utm_zone(code)
    hemi = "N" if north else "S"
    return f'PROJCRS["WGS 84 / UTM zone {zone}{hemi}",ID["EPSG",{code}]]'


def haversine_m(lon1, lat1, lon2, lat2):
    """Great-circle distance in meters (vectorized), spherical earth R=6371008.8."""
    r = 6371008.8
    p1, p2 = np.radians(np.asarray(lat1)), np.radians(np.asarray(lat2))
    dphi = p2 - p1
    dlam = np.radians(np.asarray(lon2)) - np.radians(np.asarray(lon1))
    h = np.sin(dphi / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dlam / 2) ** 2
    return 2 * r * np.arcsin(np.sqrt(np.clip(h, 0, 1)))
