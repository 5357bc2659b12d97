"""Deterministic grid/pyramid planning kernels (pure Python + NumPy).

These reimplement, from the documented semantics, the reference's
geometry/planning functions so that partition layouts and pyramid metadata
match exactly:

* aligned chunk size        — reference ``conversion/utils.py:161-189``
* shard dimension           — reference ``conversion/geozarr.py:1651-1688``
* overview level enumeration — reference ``conversion/geozarr.py:797-838``
* zoom calculation          — reference ``s2_optimization/s2_multiscale.py:680-684``
* affine transforms         — reference ``s2_multiscale.py:68-130``, ``geozarr.py:649-653``
* CF scale/offset codec     — reference ``codecs/scale_offset.py:15-27``
* nodata defaults           — reference ``conversion/sentinel1_reprojection.py:181-214``
* multiscale layout document — reference ``s2_multiscale.py:613-850`` (dynamic
  parent/child scale ratio, translation forced to 0 per issue #114)

Everything here is driver-side planning logic: cheap, exact, and the basis
for ``repartitionByRange`` partition counts on the Spark side.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------------------
# chunk / shard alignment
# ---------------------------------------------------------------------------


def aligned_chunk_size(dimension_size: int, target_chunk_size: int) -> int:
    """Largest divisor of ``dimension_size`` in ``(target*0.51, target]``.

    Falls back to ``min(target, dimension_size)`` when no divisor exists in
    that window.  Goldens: (1000,256)->250, (100,256)->100, (97,50)->50,
    (5490,3660)->2745.
    """
    if target_chunk_size >= dimension_size:
        return dimension_size
    for chunk_size in range(target_chunk_size, int(target_chunk_size * 0.51), -1):
        if dimension_size % chunk_size == 0:
            return chunk_size
    return min(target_chunk_size, dimension_size)


def shard_dimension(data_dim: int, chunk_dim: int) -> int:
    """Shard size: a multiple of ``chunk_dim`` that fits in ``data_dim``.

    Full data dim when one chunk covers it; else the largest multiple of
    ``chunk_dim`` that fits (the reference's descending-multiplier search
    always lands on exactly this value — the loop formulation reduced to it).
    """
    if chunk_dim >= data_dim:
        return data_dim
    return (data_dim // chunk_dim) * chunk_dim


# ---------------------------------------------------------------------------
# pyramid geometry
# ---------------------------------------------------------------------------


def overview_levels(
    native_width: int, native_height: int, min_dimension: int = 256
) -> list[dict]:
    """COG-style /2 overview enumeration (level 0 = native resolution).

    Stops once ``min(w, h)`` would drop below ``min_dimension``.  Golden:
    1024x1024 @ min_dim 256 -> levels {0:1024, 1:512, 2:256}, scale {1,2,4}.
    """
    levels: list[dict] = []
    level = 0
    w, h = native_width, native_height
    while min(w, h) >= min_dimension:
        levels.append(
            {
                "level": level,
                "width": w,
                "height": h,
                "translation_relative": 0.0,
                "scale_relative": 2**level,
            }
        )
        level += 1
        w = native_width // (2**level)
        h = native_height // (2**level)
    return levels


def zoom_level(width: int, height: int, tile_width: int = 256) -> int:
    """Web-map zoom for a level: ``max(ceil(log2(w/tile)), ceil(log2(h/tile)))``."""
    zw = max(0, int(math.ceil(math.log2(width / tile_width)))) if width > 0 else 0
    zh = max(0, int(math.ceil(math.log2(height / tile_width)))) if height > 0 else 0
    return max(zw, zh)


# ---------------------------------------------------------------------------
# affine transforms  (rasterio coefficient order: a, b, c, d, e, f)
#   x_geo = a * col + b * row + c ;  y_geo = d * col + e * row + f
# ---------------------------------------------------------------------------

Affine = tuple[float, float, float, float, float, float]


def affine_from_bounds(
    left: float, bottom: float, right: float, top: float, width: int, height: int
) -> Affine:
    """North-up affine from bounds (matches rasterio.transform.from_bounds)."""
    a = (right - left) / width
    e = -(top - bottom) / height
    return (a, 0.0, left, 0.0, e, top)


def transform_from_coordinates(x_coords, y_coords) -> Affine | None:
    """Affine from 1-D coordinate arrays (None if <2 points).

    Anchors the origin at the FIRST coordinate values (x.min(), y.max()) —
    the reference's own convention (`geozarr.py:1358-1370` builds the
    GeoTransform from ``x_coords[0]``/``y_coords[0]`` directly, no
    half-pixel shift), so metadata comparisons via ``transforms_close``
    agree with reference-produced documents.
    """
    x = np.asarray(x_coords, dtype=np.float64)
    y = np.asarray(y_coords, dtype=np.float64)
    if x.size < 2 or y.size < 2:
        return None
    px = float(np.abs(x[1] - x[0]))
    py = float(np.abs(y[1] - y[0]))
    return (px, 0.0, float(x.min()), 0.0, -py, float(y.max()))


def transforms_close(t1: Affine | None, t2: Affine | None) -> bool:
    """Per-coefficient isclose comparison (transform consistency check)."""
    if t1 is None or t2 is None:
        return False
    return all(np.isclose(a, b) for a, b in zip(t1, t2))


def preferred_spatial_transform(
    coordinate_transform: Affine | None, metadata_transform: Affine | None
) -> Affine | None:
    """Prefer metadata transform only when it matches the coordinate grid."""
    if (
        metadata_transform is not None
        and not all(v == 0 for v in metadata_transform)
        and transforms_close(metadata_transform, coordinate_transform)
    ):
        return metadata_transform
    return coordinate_transform or metadata_transform


def gdal_geotransform(affine: Affine) -> str:
    """GDAL GeoTransform string ``"c a b f d e"`` (origin-x, px-w, rot, origin-y, rot, px-h)."""
    a, b, c, d, e, f = affine
    return f"{c} {a} {b} {f} {d} {e}"


def pixel_centers(origin: float, step: float, n: int) -> np.ndarray:
    """Pixel-center coordinates: ``origin + step * (i + 0.5)`` for i in [0, n)."""
    return origin + step * (np.arange(n, dtype=np.float64) + 0.5)


def coords_from_bounds(
    left: float, bottom: float, right: float, top: float, width: int, height: int
) -> tuple[np.ndarray, np.ndarray]:
    """Edge-anchored coordinate arrays like the reference's ``np.linspace(...,
    endpoint=False)``: x ascending from ``left``, y descending from ``top``."""
    xs = np.linspace(left, right, width, endpoint=False)
    ys = np.linspace(top, bottom, height, endpoint=False)
    return xs, ys


def point_to_pixel(affine: Affine, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Inverse affine for north-up transforms: geo coords -> (col, row) int indices."""
    a, _b, c, _d, e, f = affine
    col = np.floor((np.asarray(x) - c) / a).astype(np.int64)
    row = np.floor((np.asarray(y) - f) / e).astype(np.int64)
    return col, row


# ---------------------------------------------------------------------------
# CF scale/offset codec + fill values
# ---------------------------------------------------------------------------


def cf_decode(packed: np.ndarray, scale_factor: float, add_offset: float) -> np.ndarray:
    """CF unpacking: ``unpacked = packed * scale_factor + add_offset``."""
    return np.asarray(packed, dtype=np.float64) * scale_factor + add_offset


def cf_encode(
    values: np.ndarray, scale_factor: float, add_offset: float, fill_sentinel: float = 0
) -> np.ndarray:
    """CF packing: ``round((x - add_offset) / scale_factor)``; NaN -> sentinel."""
    v = np.asarray(values, dtype=np.float64)
    packed = np.round((v - add_offset) / scale_factor)
    return np.where(np.isnan(v), float(fill_sentinel), packed)


def default_nodata(dtype) -> float:
    """Per-dtype nodata defaults: u8->255, u16->65535, i16->-32768, int->0, float->NaN."""
    dt = np.dtype(dtype)
    if dt == np.uint8:
        return 255
    if dt == np.uint16:
        return 65535
    if dt == np.int16:
        return -32768
    if np.issubdtype(dt, np.integer):
        return 0
    return float("nan")


def canonicalize_json_floats(obj):
    """Recursively replace NaN/+-Inf floats with "NaN"/"Infinity"/"-Infinity" strings."""
    if isinstance(obj, float):
        if math.isnan(obj):
            return "NaN"
        if math.isinf(obj):
            return "Infinity" if obj > 0 else "-Infinity"
        return obj
    if isinstance(obj, dict):
        return {k: canonicalize_json_floats(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [canonicalize_json_floats(v) for v in obj]
    return obj


def sanitize_array_attrs(attrs: dict, is_decoded_float: bool = False) -> dict:
    """Attribute sanitization: drop private/encoding attrs; fix units on decode."""
    out = {k: v for k, v in attrs.items() if k not in ("_eopf_attrs", "_FillValue")}
    if is_decoded_float:
        for key in ("dtype", "fill_value", "valid_min", "valid_max"):
            out.pop(key, None)
        if out.get("units") == "digital_counts":
            out["units"] = "1"
    return out


# ---------------------------------------------------------------------------
# per-CRS coordinate-attribute templates (F13)
# ---------------------------------------------------------------------------


def coord_attr_template(coord_name: str, epsg: int | None) -> dict:
    """CF attribute template for a coordinate variable, per CRS.

    Re-derives the reference's coordinate-metadata rules (semantics from
    ``conversion/geozarr.py:1540-1577`` — the ``_get_{x,y,lon,lat}_coord_attrs``
    templates — and ``geozarr.py:1265-1337`` — ``_add_coordinate_metadata``'s
    per-name dispatch): a geographic CRS (EPSG:4326) names the spatial axes
    ``longitude``/``latitude`` in ``degrees_east``/``degrees_north``; any
    projected CRS names them ``projection_x/y_coordinate`` in meters.
    ``time``/``angle``/``band``/``detector`` are CRS-independent; any other
    coordinate gets only its dimension registration.
    """
    geographic = epsg == 4326
    if coord_name == "x":
        if geographic:
            return {
                "_ARRAY_DIMENSIONS": ["x"],
                "standard_name": "longitude",
                "units": "degrees_east",
                "long_name": "longitude",
            }
        return {
            "_ARRAY_DIMENSIONS": ["x"],
            "standard_name": "projection_x_coordinate",
            "units": "m",
            "long_name": "x coordinate of projection",
        }
    if coord_name == "y":
        if geographic:
            return {
                "_ARRAY_DIMENSIONS": ["y"],
                "standard_name": "latitude",
                "units": "degrees_north",
                "long_name": "latitude",
            }
        return {
            "_ARRAY_DIMENSIONS": ["y"],
            "standard_name": "projection_y_coordinate",
            "units": "m",
            "long_name": "y coordinate of projection",
        }
    if coord_name == "time":
        return {"_ARRAY_DIMENSIONS": ["time"], "standard_name": "time"}
    if coord_name == "angle":
        return {
            "_ARRAY_DIMENSIONS": ["angle"],
            "standard_name": "angle",
            "long_name": "angle coordinate",
        }
    if coord_name == "band":
        return {
            "_ARRAY_DIMENSIONS": ["band"],
            "standard_name": "band",
            "long_name": "spectral band identifier",
        }
    if coord_name == "detector":
        return {
            "_ARRAY_DIMENSIONS": ["detector"],
            "standard_name": "detector",
            "long_name": "detector identifier",
        }
    return {"_ARRAY_DIMENSIONS": [coord_name]}


# ---------------------------------------------------------------------------
# multiscale layout document
# ---------------------------------------------------------------------------


@dataclass
class LevelGeom:
    """Geometry of one pyramid level (asset = group/partition name)."""

    asset: str
    width: int
    height: int
    resolution_m: float
    derived_from: str | None = None
    transform: Affine | None = None


@dataclass
class MultiscaleLayout:
    """Queryable pyramid-layout document (the metadata-table row schema)."""

    levels: list[dict] = field(default_factory=list)
    resampling_method: str = "average"
    native_bounds: tuple[float, float, float, float] | None = None


def multiscale_layout(
    levels: list[LevelGeom],
    native_bounds: tuple[float, float, float, float],
    tile_width: int = 256,
) -> MultiscaleLayout:
    """Build the multiscales ``layout`` entries for a pyramid.

    Relative scale uses the *actual* parent/child dimension ratio,
    ``max(scale_x, scale_y)``; relative translation is forced to 0.
    """
    by_asset = {lv.asset: lv for lv in levels}
    ordered = sorted(levels, key=lambda lv: lv.resolution_m)
    out: list[dict] = []
    for lv in ordered:
        if lv is ordered[0] or lv.derived_from is None:
            rel_scale = 1.0
        else:
            parent = by_asset.get(lv.derived_from)
            if parent is None:
                rel_scale = 1.0
            else:
                sx = parent.width / lv.width if lv.width > 0 else 1.0
                sy = parent.height / lv.height if lv.height > 0 else 1.0
                rel_scale = max(sx, sy)
        left, bottom, right, top = native_bounds
        transform = lv.transform or affine_from_bounds(
            left, bottom, right, top, lv.width, lv.height
        )
        out.append(
            {
                "asset": lv.asset,
                "derived_from": lv.derived_from,
                "zoom": zoom_level(lv.width, lv.height, tile_width),
                "transform": {"scale": rel_scale, "translation": 0.0},
                "spatial:shape": [lv.height, lv.width],
                "spatial:transform": list(transform),
            }
        )
    return MultiscaleLayout(levels=out, native_bounds=native_bounds)
