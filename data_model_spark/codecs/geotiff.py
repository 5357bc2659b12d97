"""Pure NumPy + zlib GeoTIFF codec (tiled uint16, Deflate or raw).

GeoTIFF is the EO interop container every downstream consumer reads —
the reference itself writes it on the Sentinel-1 reprojection path
(``src/eopf_geozarr/conversion/sentinel1_reprojection.py:301``,
``driver="GTiff"`` via rasterio).  No raster library (rasterio, GDAL,
PIL) is available in this container, so the engine ships a real,
from-spec implementation of the subset EO scenes need, written from
the public TIFF 6.0 and OGC GeoTIFF 1.1 specifications:

* classic little-endian TIFF, single IFD, single band;
* 16-bit unsigned samples, PhotometricInterpretation = BlackIsZero;
* TILED layout (TileWidth/TileLength, right/bottom edge tiles padded —
  the spec's rule), Compression = 8 (Deflate/zlib) or 1 (none);
* georeferencing: ModelPixelScaleTag (33550), ModelTiepointTag (33922,
  raster (0,0) -> projected anchor), GeoKeyDirectoryTag (34735) with
  GTModelTypeGeoKey = 1 (projected), GTRasterTypeGeoKey = 1
  (PixelIsArea) and ProjectedCSTypeGeoKey = the EPSG code.

The decoder parses the IFD generically (any tag order), validates the
layout subset, inflates tiles and reassembles the array, and returns
the georeferencing triplet alongside the pixels — enough to round-trip
every file this encoder writes and externally-produced files in the
same subset.  Used inside Arrow-batched pandas UDFs; all pixel work is
vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_II = b"II*\x00"  # little-endian classic TIFF magic

# TIFF tag ids
_T_WIDTH = 256
_T_LENGTH = 257
_T_BPS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_SPP = 277
_T_TILE_W = 322
_T_TILE_L = 323
_T_TILE_OFFSETS = 324
_T_TILE_BYTECOUNTS = 325
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE = 33550
_T_TIEPOINT = 33922
_T_GEO_KEYS = 34735

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 12: 8}

TILE = 256


def encode_geotiff(
    arr: np.ndarray,
    origin_xy: tuple[float, float],
    pixel_size: float,
    epsg: int,
    compress: bool = True,
) -> bytes:
    """Serialize a (h, w) uint16 array as a tiled GeoTIFF.

    ``origin_xy`` is the projected coordinate of the TOP-LEFT raster
    corner (tiepoint (0,0,0) -> (x, y, 0)); north-up, square pixels.
    """
    if arr.dtype != np.uint16 or arr.ndim != 2:
        raise ValueError("encode_geotiff expects a 2-D uint16 array")
    h, w = arr.shape
    tiles_across = (w + TILE - 1) // TILE
    tiles_down = (h + TILE - 1) // TILE
    payloads: list[bytes] = []
    for ty in range(tiles_down):
        for tx in range(tiles_across):
            block = arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
            if block.shape != (TILE, TILE):  # edge tiles pad to full size
                full = np.zeros((TILE, TILE), np.uint16)
                full[: block.shape[0], : block.shape[1]] = block
                block = full
            raw = block.astype("<u2").tobytes()
            payloads.append(zlib.compress(raw, 6) if compress else raw)

    # geo payloads (doubles stored out-of-line)
    scale = struct.pack("<3d", pixel_size, pixel_size, 0.0)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, origin_xy[0], origin_xy[1], 0.0)
    # GeoKeyDirectory: version 1.1.0, 3 keys, all inline SHORT values
    geokeys = struct.pack(
        "<16H",
        1, 1, 0, 3,
        1024, 0, 1, 1,  # GTModelTypeGeoKey = Projected
        1025, 0, 1, 1,  # GTRasterTypeGeoKey = PixelIsArea
        3072, 0, 1, epsg,  # ProjectedCSTypeGeoKey
    )

    n_tiles = len(payloads)
    entries: list[tuple[int, int, int, bytes | int]] = [
        (_T_WIDTH, _TYPE_LONG, 1, w),
        (_T_LENGTH, _TYPE_LONG, 1, h),
        (_T_BPS, _TYPE_SHORT, 1, 16),
        (_T_COMPRESSION, _TYPE_SHORT, 1, 8 if compress else 1),
        (_T_PHOTOMETRIC, _TYPE_SHORT, 1, 1),
        (_T_SPP, _TYPE_SHORT, 1, 1),
        (_T_TILE_W, _TYPE_SHORT, 1, TILE),
        (_T_TILE_L, _TYPE_SHORT, 1, TILE),
        (_T_TILE_OFFSETS, _TYPE_LONG, n_tiles, None),  # patched below
        (_T_TILE_BYTECOUNTS, _TYPE_LONG, n_tiles, None),
        (_T_SAMPLE_FORMAT, _TYPE_SHORT, 1, 1),
        (_T_PIXEL_SCALE, _TYPE_DOUBLE, 3, scale),
        (_T_TIEPOINT, _TYPE_DOUBLE, 6, tie),
        (_T_GEO_KEYS, _TYPE_SHORT, len(geokeys) // 2, geokeys),
    ]
    entries.sort(key=lambda e: e[0])

    # layout: header(8) | IFD | out-of-line arrays | tile data
    ifd_size = 2 + 12 * len(entries) + 4
    pos = 8 + ifd_size
    outline: list[bytes] = []

    def alloc(data: bytes) -> int:
        nonlocal pos
        off = pos
        outline.append(data)
        pos += len(data)
        return off

    # tile offset/bytecount arrays go out-of-line (n_tiles >= 1 each)
    bytecounts = [len(p) for p in payloads]
    off_counts = alloc(struct.pack(f"<{n_tiles}I", *bytecounts))
    off_offsets_slot = alloc(b"\x00" * 4 * n_tiles)  # patched after data pos known
    geo_offsets = {}
    for tag, typ, cnt, val in entries:
        if isinstance(val, bytes) and cnt * _TYPE_SIZE[typ] > 4:
            geo_offsets[tag] = alloc(val)

    data_start = pos
    tile_offsets = []
    for p in payloads:
        tile_offsets.append(pos)
        pos += len(p)
    # patch the offsets array
    outline[1] = struct.pack(f"<{n_tiles}I", *tile_offsets)

    def entry_bytes(tag: int, typ: int, cnt: int, val) -> bytes:
        head = struct.pack("<HHI", tag, typ, cnt)
        if tag == _T_TILE_OFFSETS:
            if n_tiles == 1:
                return head + struct.pack("<I", tile_offsets[0])
            return head + struct.pack("<I", off_offsets_slot)
        if tag == _T_TILE_BYTECOUNTS:
            if n_tiles == 1:
                return head + struct.pack("<I", bytecounts[0])
            return head + struct.pack("<I", off_counts)
        if isinstance(val, bytes):
            if len(val) > 4:
                return head + struct.pack("<I", geo_offsets[tag])
            return head + val.ljust(4, b"\x00")
        if typ == _TYPE_SHORT:
            return head + struct.pack("<HH", val, 0)
        return head + struct.pack("<I", val)

    ifd = struct.pack("<H", len(entries))
    for e in entries:
        ifd += entry_bytes(*e)
    ifd += struct.pack("<I", 0)  # no next IFD

    blob = _II + struct.pack("<I", 8) + ifd + b"".join(outline) + b"".join(payloads)
    assert len(blob) == pos
    return blob


def decode_geotiff(data: bytes):
    """(array, origin_xy, pixel_size, epsg) from a tiled GeoTIFF.

    Supports the subset ``encode_geotiff`` writes: classic LE TIFF,
    single band, 16-bit unsigned, tiled, Deflate or uncompressed.
    """
    if data[:4] != _II:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    (n_entries,) = struct.unpack_from("<H", data, ifd_off)
    tags: dict[int, tuple[int, int, int | bytes]] = {}
    for i in range(n_entries):
        tag, typ, cnt = struct.unpack_from("<HHI", data, ifd_off + 2 + 12 * i)
        raw = data[ifd_off + 2 + 12 * i + 8 : ifd_off + 2 + 12 * i + 12]
        size = cnt * _TYPE_SIZE[typ]
        if size > 4:
            (off,) = struct.unpack_from("<I", raw, 0)
            payload = data[off : off + size]
        else:
            payload = raw[:size]
        tags[tag] = (typ, cnt, payload)

    def ints(tag):
        typ, cnt, payload = tags[tag]
        fmt = "<%d%s" % (cnt, "H" if typ == _TYPE_SHORT else "I")
        return list(struct.unpack(fmt, payload))

    w, h = ints(_T_WIDTH)[0], ints(_T_LENGTH)[0]
    if ints(_T_BPS)[0] != 16 or ints(_T_SPP)[0] != 1:
        raise ValueError("unsupported sample layout")
    comp = ints(_T_COMPRESSION)[0]
    if comp not in (1, 8):
        raise ValueError(f"unsupported compression {comp}")
    tw, tl = ints(_T_TILE_W)[0], ints(_T_TILE_L)[0]
    offsets = ints(_T_TILE_OFFSETS)
    counts = ints(_T_TILE_BYTECOUNTS)
    tiles_across = (w + tw - 1) // tw
    tiles_down = (h + tl - 1) // tl
    if len(offsets) != tiles_across * tiles_down:
        raise ValueError("tile count mismatch")
    out = np.zeros((tiles_down * tl, tiles_across * tw), np.uint16)
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        raw = data[off : off + cnt]
        if comp == 8:
            raw = zlib.decompress(raw)
        block = np.frombuffer(raw, "<u2").reshape(tl, tw)
        ty, tx = divmod(i, tiles_across)
        out[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = block
    arr = out[:h, :w].copy()

    sx, sy, _ = struct.unpack("<3d", tags[_T_PIXEL_SCALE][2])
    tie = struct.unpack("<6d", tags[_T_TIEPOINT][2])
    origin = (tie[3], tie[4])
    gk = struct.unpack(f"<{tags[_T_GEO_KEYS][1]}H", tags[_T_GEO_KEYS][2])
    epsg = 0
    for i in range(gk[3]):
        kid, loc, cnt, val = gk[4 + 4 * i : 8 + 4 * i]
        if kid == 3072 and loc == 0:
            epsg = val
    if sx != sy:
        raise ValueError("non-square pixels unsupported")
    return arr, origin, sx, epsg


# ---------------------------------------------------------------------------
# Cloud-Optimized GeoTIFF: chained overview IFDs
# ---------------------------------------------------------------------------

_T_SUBFILE = 254  # NewSubfileType: 1 = reduced-resolution overview


def downsample2x_u16(arr: np.ndarray) -> np.ndarray:
    """Exact 2x2 block mean, HALF-UP integer rounding ((s + 2) // 4) —
    the deterministic sibling of the engine's A1 block mean; odd
    trailing rows/cols truncate (GDAL-average-like)."""
    h, w = arr.shape
    a = arr[: h // 2 * 2, : w // 2 * 2].astype(np.int64)
    s = a[0::2, 0::2] + a[0::2, 1::2] + a[1::2, 0::2] + a[1::2, 1::2]
    return ((s + 2) // 4).astype(np.uint16)


def _level_entries(
    arr: np.ndarray,
    payload_lens: list[int],
    is_overview: bool,
    geo: tuple[bytes, bytes, bytes] | None,
    compress: bool,
):
    """IFD entry spec list for one level: (tag, type, count, value).

    ``value`` is an int (inline numeric), bytes (payload, out-of-line if
    > 4 bytes) or the strings "offsets"/"bytecounts" (patched later).
    """
    h, w = arr.shape
    entries: list[tuple] = [
        (_T_WIDTH, _TYPE_LONG, 1, w),
        (_T_LENGTH, _TYPE_LONG, 1, h),
        (_T_BPS, _TYPE_SHORT, 1, 16),
        (_T_COMPRESSION, _TYPE_SHORT, 1, 8 if compress else 1),
        (_T_PHOTOMETRIC, _TYPE_SHORT, 1, 1),
        (_T_SPP, _TYPE_SHORT, 1, 1),
        (_T_TILE_W, _TYPE_SHORT, 1, TILE),
        (_T_TILE_L, _TYPE_SHORT, 1, TILE),
        (_T_TILE_OFFSETS, _TYPE_LONG, len(payload_lens), "offsets"),
        (_T_TILE_BYTECOUNTS, _TYPE_LONG, len(payload_lens), "bytecounts"),
        (_T_SAMPLE_FORMAT, _TYPE_SHORT, 1, 1),
    ]
    if is_overview:
        entries.append((_T_SUBFILE, _TYPE_LONG, 1, 1))
    if geo is not None:
        scale, tie, keys = geo
        entries.append((_T_PIXEL_SCALE, _TYPE_DOUBLE, 3, scale))
        entries.append((_T_TIEPOINT, _TYPE_DOUBLE, 6, tie))
        entries.append((_T_GEO_KEYS, _TYPE_SHORT, len(keys) // 2, keys))
    entries.sort(key=lambda e: e[0])
    return entries


def _tile_payloads(arr: np.ndarray, compress: bool) -> list[bytes]:
    h, w = arr.shape
    out: list[bytes] = []
    for ty in range((h + TILE - 1) // TILE):
        for tx in range((w + TILE - 1) // TILE):
            block = arr[ty * TILE : (ty + 1) * TILE, tx * TILE : (tx + 1) * TILE]
            if block.shape != (TILE, TILE):
                full = np.zeros((TILE, TILE), np.uint16)
                full[: block.shape[0], : block.shape[1]] = block
                block = full
            raw = block.astype("<u2").tobytes()
            out.append(zlib.compress(raw, 6) if compress else raw)
    return out


def encode_cog(
    arr: np.ndarray,
    origin_xy: tuple[float, float],
    pixel_size: float,
    epsg: int,
    compress: bool = True,
    min_overview_px: int = TILE,
) -> bytes:
    """Cloud-Optimized GeoTIFF: full resolution + /2 overview chain.

    COG layout: ALL IFDs (with their out-of-line arrays) sit at the
    front of the file, tile data follows with overview levels FIRST —
    a range-request reader fetches the header block once and the
    low-resolution data cheaply.  Overviews carry NewSubfileType = 1;
    georeferencing tags live on IFD 0 (each overview's grid derives
    from it by its decimation factor, per the COG spec).
    """
    if arr.dtype != np.uint16 or arr.ndim != 2:
        raise ValueError("encode_cog expects a 2-D uint16 array")
    levels = [arr]
    while min(levels[-1].shape) // 2 >= min_overview_px:
        levels.append(downsample2x_u16(levels[-1]))

    scale = struct.pack("<3d", pixel_size, pixel_size, 0.0)
    tie = struct.pack("<6d", 0.0, 0.0, 0.0, origin_xy[0], origin_xy[1], 0.0)
    keys = struct.pack(
        "<16H", 1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1, 3072, 0, 1, epsg
    )

    payloads = [_tile_payloads(lv, compress) for lv in levels]
    entry_sets = [
        _level_entries(
            lv,
            [len(p) for p in pls],
            li > 0,
            (scale, tie, keys) if li == 0 else None,
            compress,
        )
        for li, (lv, pls) in enumerate(zip(levels, payloads))
    ]

    # pass 1: lay out IFDs + their out-of-line blocks front-to-back
    pos = 8
    ifd_pos: list[int] = []
    outline_pos: list[dict] = []  # per level: tag -> offset (incl. synthetic)
    for entries, pls in zip(entry_sets, payloads):
        ifd_pos.append(pos)
        pos += 2 + 12 * len(entries) + 4
        offs: dict = {}
        n_tiles = len(pls)
        if n_tiles > 1:
            offs["bytecounts"] = pos
            pos += 4 * n_tiles
            offs["offsets"] = pos
            pos += 4 * n_tiles
        for tag, typ, cnt, val in entries:
            if isinstance(val, bytes) and cnt * _TYPE_SIZE[typ] > 4:
                offs[tag] = pos
                pos += cnt * _TYPE_SIZE[typ]
        outline_pos.append(offs)

    # pass 2: tile data — overview levels first (COG read pattern)
    data_order = list(range(len(levels)))[::-1]
    tile_offsets: list[list[int]] = [[] for _ in levels]
    for li in data_order:
        for p in payloads[li]:
            tile_offsets[li].append(pos)
            pos += len(p)

    # pass 3: serialize
    out = bytearray()
    out += _II + struct.pack("<I", 8)
    for li, (entries, pls) in enumerate(zip(entry_sets, payloads)):
        n_tiles = len(pls)
        bytecounts = [len(p) for p in pls]
        ifd = struct.pack("<H", len(entries))
        for tag, typ, cnt, val in entries:
            head = struct.pack("<HHI", tag, typ, cnt)
            if val == "offsets":
                ptr = (
                    tile_offsets[li][0]
                    if n_tiles == 1
                    else outline_pos[li]["offsets"]
                )
                ifd += head + struct.pack("<I", ptr)
            elif val == "bytecounts":
                ptr = (
                    bytecounts[0] if n_tiles == 1 else outline_pos[li]["bytecounts"]
                )
                ifd += head + struct.pack("<I", ptr)
            elif isinstance(val, bytes):
                if cnt * _TYPE_SIZE[typ] > 4:
                    ifd += head + struct.pack("<I", outline_pos[li][tag])
                else:
                    ifd += head + val.ljust(4, b"\x00")
            elif typ == _TYPE_SHORT:
                ifd += head + struct.pack("<HH", val, 0)
            else:
                ifd += head + struct.pack("<I", val)
        nxt = ifd_pos[li + 1] if li + 1 < len(levels) else 0
        ifd += struct.pack("<I", nxt)
        out += ifd
        if n_tiles > 1:
            out += struct.pack(f"<{n_tiles}I", *bytecounts)
            out += struct.pack(f"<{n_tiles}I", *tile_offsets[li])
        for tag, typ, cnt, val in entries:
            if isinstance(val, bytes) and cnt * _TYPE_SIZE[typ] > 4:
                out += val
    for li in data_order:
        for p in payloads[li]:
            out += p
    assert len(out) == pos
    return bytes(out)


def decode_cog(data: bytes):
    """[(array, is_overview)] for every IFD plus (origin, pixel_size,
    epsg) from IFD 0 — walks the IFD chain with the same subset parser."""
    if data[:4] != _II:
        raise ValueError("not a little-endian classic TIFF")
    (ifd_off,) = struct.unpack_from("<I", data, 4)
    levels = []
    geo = None
    while ifd_off:
        (n_entries,) = struct.unpack_from("<H", data, ifd_off)
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n_entries):
            tag, typ, cnt = struct.unpack_from("<HHI", data, ifd_off + 2 + 12 * i)
            raw = data[ifd_off + 2 + 12 * i + 8 : ifd_off + 2 + 12 * i + 12]
            size = cnt * _TYPE_SIZE[typ]
            if size > 4:
                (off,) = struct.unpack_from("<I", raw, 0)
                payload = data[off : off + size]
            else:
                payload = raw[:size]
            tags[tag] = (typ, cnt, payload)

        def ints(tag):
            typ, cnt, payload = tags[tag]
            fmt = "<%d%s" % (cnt, "H" if typ == _TYPE_SHORT else "I")
            return list(struct.unpack(fmt, payload))

        w, h = ints(_T_WIDTH)[0], ints(_T_LENGTH)[0]
        comp = ints(_T_COMPRESSION)[0]
        tw, tl = ints(_T_TILE_W)[0], ints(_T_TILE_L)[0]
        offsets, counts = ints(_T_TILE_OFFSETS), ints(_T_TILE_BYTECOUNTS)
        across = (w + tw - 1) // tw
        grid = np.zeros((((h + tl - 1) // tl) * tl, across * tw), np.uint16)
        for i, (off, cnt) in enumerate(zip(offsets, counts)):
            raw = data[off : off + cnt]
            if comp == 8:
                raw = zlib.decompress(raw)
            ty, tx = divmod(i, across)
            grid[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = np.frombuffer(
                raw, "<u2"
            ).reshape(tl, tw)
        is_ov = _T_SUBFILE in tags and ints(_T_SUBFILE)[0] == 1
        levels.append((grid[:h, :w].copy(), is_ov))
        if _T_GEO_KEYS in tags and geo is None:
            sx, sy, _ = struct.unpack("<3d", tags[_T_PIXEL_SCALE][2])
            tie = struct.unpack("<6d", tags[_T_TIEPOINT][2])
            gk = struct.unpack(f"<{tags[_T_GEO_KEYS][1]}H", tags[_T_GEO_KEYS][2])
            epsg = 0
            for i in range(gk[3]):
                kid, loc, cnt, val = gk[4 + 4 * i : 8 + 4 * i]
                if kid == 3072 and loc == 0:
                    epsg = val
            geo = ((tie[3], tie[4]), sx, epsg)
        (ifd_off,) = struct.unpack_from(
            "<I", data, ifd_off + 2 + 12 * n_entries
        )
    return levels, geo
