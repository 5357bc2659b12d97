"""GeoTIFF export surface: encode -> decode -> validated fingerprint.

The engine-side counterpart of the reference's GTiff write
(``src/eopf_geozarr/conversion/sentinel1_reprojection.py:301``): every
scene's pixels serialize to a tiled Deflate GeoTIFF
(``codecs/geotiff.py``, written from the public TIFF 6.0 / OGC GeoTIFF
1.1 specs) carrying the UTM anchor, pixel scale, and EPSG geokeys; the
same pass decodes its own output and proves the round trip (pixel CRC
equality, georeferencing echo).

Scale shape: one zero-shuffle ``mapInPandas`` over the scan —
encode + decode + CRC are per-scene local work, embarrassingly
parallel at 10^12 scenes.  Exactness: zlib with a fixed level is
deterministic for fixed input within one build, and the oracle replays
the IDENTICAL kernel driver-side, so byte lengths and CRCs are
hash-exact.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..codecs.geotiff import decode_geotiff, encode_geotiff
from ..sources import images as img_src
from .registry import register

N_SCENES = 200  # pixel-real fixture (encode touches every sample)
EPSG = img_src.SCENE_EPSG


def scene_geotiff_row(image_id: str, w: int, h: int) -> tuple:
    """(tif_len, tif_crc, px_crc, ox_mm, oy_mm, ok) for one scene."""
    pix = img_src.synth_pixels(image_id, w, h)
    i = img_src.image_index(image_id)
    ax, ay = img_src.scene_anchor(i)
    # raster row 0 is the NORTH edge: top-left corner sits one full
    # height above the anchor (south-west corner) in projected space
    origin = (ax, ay + h * img_src.PIXEL_SIZE_M)
    blob = encode_geotiff(pix, origin, img_src.PIXEL_SIZE_M, EPSG)
    arr, o2, ps, epsg = decode_geotiff(blob)
    ok = (
        np.array_equal(arr, pix)
        and o2 == origin
        and ps == img_src.PIXEL_SIZE_M
        and epsg == EPSG
    )
    return (
        len(blob),
        zlib.crc32(blob) & 0xFFFFFFFF,
        zlib.crc32(pix.astype("<u2").tobytes()) & 0xFFFFFFFF,
        int(origin[0] * 1000),
        int(origin[1] * 1000),
        bool(ok),
    )


def geotiff_roundtrip(spark: SparkSession, n: int = N_SCENES) -> DataFrame:
    meta = img_src.generate_images_meta_df(spark, n).select("image_id", "w", "h")

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                tl, tc, pc, ox, oy, ok = scene_geotiff_row(
                    row.image_id, int(row.w), int(row.h)
                )
                recs.append(
                    {
                        "image_id": row.image_id,
                        "tif_len": tl,
                        "tif_crc": tc,
                        "px_crc": pc,
                        "ox_mm": ox,
                        "oy_mm": oy,
                        "ok": ok,
                    }
                )
            cols = ["image_id", "tif_len", "tif_crc", "px_crc", "ox_mm", "oy_mm", "ok"]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return meta.mapInPandas(
        kern,
        "image_id string, tif_len long, tif_crc long, px_crc long, "
        "ox_mm long, oy_mm long, ok boolean",
    )


def _geotiff_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for i in range(N_SCENES):
        image_id = f"img_{i:012d}"
        w, h = img_src.image_dims(i)
        tl, tc, pc, ox, oy, ok = scene_geotiff_row(image_id, w, h)
        rows.append((image_id, tl, tc, pc, ox, oy, ok))
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("tif_len", "BIGINT"),
            ("tif_crc", "BIGINT"),
            ("px_crc", "BIGINT"),
            ("ox_mm", "BIGINT"),
            ("oy_mm", "BIGINT"),
            ("ok", "BOOLEAN"),
        ],
        rows,
    )


@register("geotiff_rt_fp", _geotiff_oracle)
def geotiff_rt_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiled-Deflate GeoTIFF encode->decode round trip of the first 200
    scenes: byte/pixel CRCs + georeferencing echo, hash-checked against
    the identical driver-side replay."""
    return geotiff_roundtrip(spark)


# ---------------------------------------------------------------------------
# Cloud-Optimized GeoTIFF round trip
# ---------------------------------------------------------------------------


def scene_cog_row(image_id: str, w: int, h: int) -> tuple:
    """(cog_len, cog_crc, n_levels, ov_crc, ok) for one scene."""
    from ..codecs.geotiff import decode_cog, downsample2x_u16, encode_cog

    pix = img_src.synth_pixels(image_id, w, h)
    i = img_src.image_index(image_id)
    ax, ay = img_src.scene_anchor(i)
    origin = (ax, ay + h * img_src.PIXEL_SIZE_M)
    blob = encode_cog(pix, origin, img_src.PIXEL_SIZE_M, EPSG, min_overview_px=64)
    levels, geo = decode_cog(blob)
    ok = (
        np.array_equal(levels[0][0], pix)
        and not levels[0][1]
        and geo == (origin, img_src.PIXEL_SIZE_M, EPSG)
    )
    cur = pix
    ov_crc = 0
    for lv, is_ov in levels[1:]:
        cur = downsample2x_u16(cur)
        ok = ok and is_ov and np.array_equal(lv, cur)
        ov_crc = zlib.crc32(cur.astype("<u2").tobytes(), ov_crc) & 0xFFFFFFFF
    return (
        len(blob),
        zlib.crc32(blob) & 0xFFFFFFFF,
        len(levels),
        ov_crc,
        bool(ok),
    )


def cog_roundtrip(spark: SparkSession, n: int = N_SCENES) -> DataFrame:
    meta = img_src.generate_images_meta_df(spark, n).select("image_id", "w", "h")

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                cl, cc, nl, oc, ok = scene_cog_row(
                    row.image_id, int(row.w), int(row.h)
                )
                recs.append(
                    {
                        "image_id": row.image_id,
                        "cog_len": cl,
                        "cog_crc": cc,
                        "n_levels": nl,
                        "ov_crc": oc,
                        "ok": ok,
                    }
                )
            cols = ["image_id", "cog_len", "cog_crc", "n_levels", "ov_crc", "ok"]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return meta.mapInPandas(
        kern,
        "image_id string, cog_len long, cog_crc long, n_levels long, "
        "ov_crc long, ok boolean",
    )


def _cog_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for i in range(N_SCENES):
        image_id = f"img_{i:012d}"
        w, h = img_src.image_dims(i)
        cl, cc, nl, oc, ok = scene_cog_row(image_id, w, h)
        rows.append((image_id, cl, cc, nl, oc, ok))
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("cog_len", "BIGINT"),
            ("cog_crc", "BIGINT"),
            ("n_levels", "BIGINT"),
            ("ov_crc", "BIGINT"),
            ("ok", "BOOLEAN"),
        ],
        rows,
    )


@register("cog_rt_fp", _cog_oracle)
def cog_rt_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cloud-Optimized GeoTIFF round trip of the first 200 scenes:
    IFD-chained /2 overviews (exact HALF-UP block means), overview-first
    data layout, georeferencing on IFD 0 — hash-checked against the
    identical driver-side replay."""
    return cog_roundtrip(spark)
