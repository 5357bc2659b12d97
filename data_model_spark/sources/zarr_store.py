"""Minimal Zarr v3 store reader/writer — pure Python, public spec only.

The reference engine's first action on real data is opening a Zarr store:
``xr.open_datatree(path, engine="zarr")`` (reference ``cli.py:174-179``).
This module gives the Spark engine the same entry point without external
packages, implementing the subset of the Zarr v3 core spec (ZEP 1,
https://zarr-specs.readthedocs.io/en/latest/v3/core/v3.0.html) the
GeoZarr layouts actually use:

* hierarchy: one ``zarr.json`` per node; ``node_type`` group|array;
  groups nest as directories (reference stores: measurement groups with
  per-band arrays, ``conversion/geozarr.py:974-1183``).
* arrays: ``regular`` chunk grid, ``default`` chunk-key encoding
  (``c/<i>/<j>`` with configurable separator), ``fill_value``,
  ``dimension_names``, free-form ``attributes``.
* codecs: the ``bytes`` array->bytes codec (little/big endian) optionally
  followed by the ``gzip`` bytes->bytes codec (zlib — stdlib), and the
  ``sharding_indexed`` array->bytes codec (ZEP 2, the reference's optional
  ``enable_sharding`` encoding, `conversion/geozarr.py:1077-1093`): shard
  objects hold a grid of inner chunks plus a uint64 (offset, nbytes) index
  (``index_location`` start|end, crc32c-checksummed via the stdlib-free
  table implementation below).  Transpose is out of scope and rejected
  explicitly.
* data types: the fixed-width numeric subset (u/i 1-8 bytes, f4/f8).

Scale design: chunk OBJECTS are the parallelism unit, exactly as in the
reference's dask-backed reads.  ``chunks_df`` lists a store's chunk files
through Spark's distributed ``binaryFile`` source (one task per file
group, no driver-side listing of chunk contents) and decodes them inside
``mapInPandas`` — at 10^12 chunks this is an embarrassingly parallel scan
whose only metadata cost is the file index.  Edge chunks are cropped to
the array bounds per the spec (stored chunks are always full-size).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZARR_FORMAT = 3

#: Zarr v3 core data type name -> numpy dtype (little-endian applied by codec)
DTYPES = {
    "uint8": "u1",
    "uint16": "u2",
    "uint32": "u4",
    "uint64": "u8",
    "int8": "i1",
    "int16": "i2",
    "int32": "i4",
    "int64": "i8",
    "float32": "f4",
    "float64": "f8",
}


# ---------------------------------------------------------------------------
# crc32c (Castagnoli), required by the sharding index codec chain.
# Table-driven reflected CRC, polynomial 0x1EDC6F41 (reflected 0x82F63B78)
# — the public algorithm (RFC 3720 §B.4); indexes are 16 B/chunk so pure
# Python is plenty.
# ---------------------------------------------------------------------------


def _crc32c_table() -> list[int]:
    tbl = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
        tbl.append(c)
    return tbl


_CRC32C_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC32C_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


#: missing-inner-chunk sentinel in the shard index (spec: 2^64 - 1)
_SHARD_MISSING = 0xFFFFFFFFFFFFFFFF


# ---------------------------------------------------------------------------
# writer (test fixtures + the engine's own GeoZarr-shaped output)
# ---------------------------------------------------------------------------


def write_group(path: str, attributes: dict | None = None) -> None:
    """Write a group node: a directory with a ``zarr.json``."""
    os.makedirs(path, exist_ok=True)
    doc = {
        "zarr_format": ZARR_FORMAT,
        "node_type": "group",
        "attributes": attributes or {},
    }
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump(doc, f, sort_keys=True)


def _pad_block(arr, idx, chunk_shape, fill_value):
    """Extract chunk ``idx``, padded with ``fill_value`` to full size."""
    sel = tuple(
        slice(i * c, min((i + 1) * c, s))
        for i, c, s in zip(idx, chunk_shape, arr.shape)
    )
    block = arr[sel]
    if block.shape != tuple(chunk_shape):
        full = np.full(chunk_shape, fill_value, dtype=arr.dtype)
        full[tuple(slice(0, e) for e in block.shape)] = block
        block = full
    return block


def _encode_block(block: np.ndarray, gzip_level: int | None) -> bytes:
    raw = np.ascontiguousarray(block, dtype=block.dtype.newbyteorder("<")).tobytes()
    return zlib.compress(raw, gzip_level) if gzip_level is not None else raw


def encode_shard(
    payloads: dict[tuple[int, ...], bytes | None],
    inner_grid: tuple[int, ...],
    index_location: str = "end",
) -> bytes:
    """Assemble one shard object from encoded inner-chunk payloads.

    ``payloads[idx] is None`` marks a missing inner chunk (readers fill it
    with ``fill_value``).  Index: row-major uint64 LE (offset, nbytes)
    pairs + crc32c, at ``index_location`` start|end per the spec.
    """
    n_inner = int(np.prod(inner_grid))
    index_nbytes = n_inner * 16 + 4  # bytes codec + crc32c
    entries = np.full((n_inner, 2), _SHARD_MISSING, dtype="<u8")
    off = index_nbytes if index_location == "start" else 0
    parts = []  # data laid out in index (row-major) order, whatever the
    #             caller's dict order was
    for pos, idx in enumerate(np.ndindex(*inner_grid)):
        p = payloads.get(idx)
        if p is None:
            continue
        entries[pos] = (off, len(p))
        off += len(p)
        parts.append(p)
    data = b"".join(parts)
    raw_index = entries.tobytes()
    index = raw_index + crc32c(raw_index).to_bytes(4, "little")
    return index + data if index_location == "start" else data + index


def write_array(
    path: str,
    arr: np.ndarray,
    chunk_shape: tuple[int, ...],
    attributes: dict | None = None,
    dimension_names: list[str] | None = None,
    gzip_level: int | None = 5,
    fill_value: float = 0,
    shards: tuple[int, ...] | None = None,
    index_location: str = "end",
) -> None:
    """Write one array node: ``zarr.json`` + full-size chunk objects.

    Edge chunks are padded with ``fill_value`` to ``chunk_shape`` as the
    spec requires; the reader crops them back against ``shape``.

    With ``shards`` set, ``chunk_shape`` is the INNER chunk shape and each
    stored object is a shard of ``shards`` cells carrying its inner-chunk
    grid + index (``sharding_indexed``, ZEP 2) — the reference's optional
    ``enable_sharding`` layout.  ``shards`` must be an integer multiple of
    ``chunk_shape`` per dimension (spec requirement).
    """
    if arr.ndim != len(chunk_shape):
        raise ValueError("chunk_shape rank must match array rank")
    dt_name = {v: k for k, v in DTYPES.items()}.get(arr.dtype.str.lstrip("<>|="))
    if dt_name is None:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    inner_codecs: list[dict] = [
        {"name": "bytes", "configuration": {"endian": "little"}}
    ]
    if gzip_level is not None:
        inner_codecs.append({"name": "gzip", "configuration": {"level": gzip_level}})
    if shards is None:
        outer_shape = tuple(chunk_shape)
        codecs = inner_codecs
    else:
        if len(shards) != arr.ndim or any(
            s % c for s, c in zip(shards, chunk_shape)
        ):
            raise ValueError("shards must be a multiple of chunk_shape per dim")
        outer_shape = tuple(shards)
        codecs = [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": list(chunk_shape),
                    "codecs": inner_codecs,
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": index_location,
                },
            }
        ]
    doc = {
        "zarr_format": ZARR_FORMAT,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": dt_name,
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": list(outer_shape)},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": "/"},
        },
        "fill_value": fill_value,
        "codecs": codecs,
        "attributes": attributes or {},
    }
    if dimension_names is not None:
        doc["dimension_names"] = dimension_names
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump(doc, f, sort_keys=True)

    grid = [
        (arr.shape[d] + outer_shape[d] - 1) // outer_shape[d]
        for d in range(arr.ndim)
    ]
    for idx in np.ndindex(*grid):
        block = _pad_block(arr, idx, outer_shape, fill_value)
        if shards is None:
            payload = _encode_block(block, gzip_level)
        else:
            inner_grid = tuple(s // c for s, c in zip(shards, chunk_shape))
            payloads = {
                iidx: _encode_block(
                    _pad_block(block, iidx, chunk_shape, fill_value), gzip_level
                )
                for iidx in np.ndindex(*inner_grid)
            }
            payload = encode_shard(payloads, inner_grid, index_location)
        key = os.path.join(path, "c", *(str(i) for i in idx))
        os.makedirs(os.path.dirname(key), exist_ok=True)
        with open(key, "wb") as f:
            f.write(payload)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def _load_node(root: str, rel: str) -> dict | None:
    p = os.path.join(root, rel, "zarr.json") if rel else os.path.join(root, "zarr.json")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        doc = json.load(f)
    if doc.get("zarr_format") != ZARR_FORMAT:
        raise ValueError(f"{rel or '/'}: zarr_format {doc.get('zarr_format')} != 3")
    return doc


def _validate_array(rel: str, doc: dict) -> dict:
    """Normalize an array node document into a flat metadata record."""
    if doc["chunk_grid"]["name"] != "regular":
        raise ValueError(f"{rel}: unsupported chunk_grid {doc['chunk_grid']['name']}")
    cke = doc.get("chunk_key_encoding", {"name": "default", "configuration": {}})
    if cke["name"] not in ("default", "v2"):
        raise ValueError(f"{rel}: unsupported chunk_key_encoding {cke['name']}")
    sep = cke.get("configuration", {}).get("separator", "/")
    codecs = doc["codecs"]
    inner_shape = None
    index_location = "end"
    if codecs and codecs[0]["name"] == "sharding_indexed":
        if len(codecs) != 1:
            raise ValueError(f"{rel}: sharding_indexed must be the sole codec")
        cfg = codecs[0]["configuration"]
        inner_shape = [int(c) for c in cfg["chunk_shape"]]
        index_location = cfg.get("index_location", "end")
        if index_location not in ("start", "end"):
            raise ValueError(f"{rel}: bad index_location {index_location}")
        idx_names = [c["name"] for c in cfg.get("index_codecs", [])]
        if idx_names not in (["bytes"], ["bytes", "crc32c"]):
            raise ValueError(
                f"{rel}: unsupported index_codecs {idx_names}"
                " (supported: bytes[, crc32c])"
            )
        codecs = cfg["codecs"]  # validate the inner chain below
    names = [c["name"] for c in codecs]
    if names not in (["bytes"], ["bytes", "gzip"]):
        raise ValueError(
            f"{rel}: unsupported codec chain {names} (supported: bytes[, gzip])"
        )
    if doc["data_type"] not in DTYPES:
        raise ValueError(f"{rel}: unsupported data_type {doc['data_type']}")
    endian = codecs[0].get("configuration", {}).get("endian", "little")
    shape = [int(s) for s in doc["shape"]]
    chunk_shape = [
        int(c) for c in doc["chunk_grid"]["configuration"]["chunk_shape"]
    ]
    if inner_shape is not None and (
        len(inner_shape) != len(chunk_shape)
        or any(s % c for s, c in zip(chunk_shape, inner_shape))
    ):
        raise ValueError(
            f"{rel}: inner chunk_shape {inner_shape} must evenly divide"
            f" shard shape {chunk_shape}"
        )
    grid = [(s + c - 1) // c for s, c in zip(shape, chunk_shape)]
    return {
        "path": rel,
        "node_type": "array",
        "shape": shape,
        "data_type": doc["data_type"],
        "chunk_shape": chunk_shape,
        "chunk_grid": grid,
        "n_chunks": int(np.prod(grid)) if grid else 1,
        "separator": sep,
        "gzip": "gzip" in names,
        "endian": endian,
        "fill_value": doc.get("fill_value", 0),
        "dimension_names": doc.get("dimension_names"),
        "attributes": doc.get("attributes", {}),
        "shard_inner_shape": inner_shape,
        "shard_index_location": index_location,
    }


def open_store(root: str) -> dict[str, dict]:
    """Walk a store directory; return ``{node_path: metadata record}``.

    Node paths are '/'-separated and '' names the root.  Directories
    without a ``zarr.json`` (chunk trees) are not descended into unless
    they are the conventional ``c`` chunk directory's siblings — i.e. any
    directory carrying a ``zarr.json`` is a node, anything else is data.
    """
    root = os.path.abspath(root)
    rootdoc = _load_node(root, "")
    if rootdoc is None:
        raise FileNotFoundError(f"{root}: not a Zarr v3 store (no zarr.json)")
    nodes: dict[str, dict] = {}

    def visit(rel: str, doc: dict) -> None:
        if doc["node_type"] == "array":
            nodes[rel] = _validate_array(rel, doc)
            return
        nodes[rel] = {
            "path": rel,
            "node_type": "group",
            "attributes": doc.get("attributes", {}),
        }
        base = os.path.join(root, rel) if rel else root
        for name in sorted(os.listdir(base)):
            sub = os.path.join(base, name)
            if not os.path.isdir(sub):
                continue
            childrel = f"{rel}/{name}" if rel else name
            childdoc = _load_node(root, childrel)
            if childdoc is not None:
                visit(childrel, childdoc)

    visit("", rootdoc)
    return nodes


def _decode_block(meta: dict, raw: bytes, block_shape) -> np.ndarray:
    if meta["gzip"]:
        raw = zlib.decompress(raw)
    dt = np.dtype(DTYPES[meta["data_type"]]).newbyteorder(
        "<" if meta["endian"] == "little" else ">"
    )
    n = int(np.prod(block_shape))
    if len(raw) != n * dt.itemsize:
        raise ValueError(
            f"{meta['path']}: chunk payload {len(raw)}B != {n * dt.itemsize}B"
        )
    return np.frombuffer(raw, dtype=dt).reshape(block_shape)


def _decode_shard(meta: dict, raw: bytes) -> np.ndarray:
    """Decode one shard object into its full shard-shaped array."""
    inner = meta["shard_inner_shape"]
    inner_grid = tuple(s // c for s, c in zip(meta["chunk_shape"], inner))
    n_inner = int(np.prod(inner_grid))
    index_nbytes = n_inner * 16 + 4
    if len(raw) < index_nbytes:
        raise ValueError(f"{meta['path']}: shard smaller than its index")
    idx_bytes = (
        raw[:index_nbytes]
        if meta["shard_index_location"] == "start"
        else raw[-index_nbytes:]
    )
    raw_index, crc = idx_bytes[:-4], idx_bytes[-4:]
    if crc32c(raw_index) != int.from_bytes(crc, "little"):
        raise ValueError(f"{meta['path']}: shard index crc32c mismatch")
    entries = np.frombuffer(raw_index, dtype="<u8").reshape(n_inner, 2)
    out = np.full(
        meta["chunk_shape"],
        meta["fill_value"],
        dtype=np.dtype(DTYPES[meta["data_type"]]),
    )
    for pos, iidx in enumerate(np.ndindex(*inner_grid)):
        off, nbytes = int(entries[pos, 0]), int(entries[pos, 1])
        if off == _SHARD_MISSING and nbytes == _SHARD_MISSING:
            continue  # missing inner chunk = fill_value per spec
        sel = tuple(
            slice(i * c, (i + 1) * c) for i, c in zip(iidx, inner)
        )
        out[sel] = _decode_block(meta, raw[off : off + nbytes], inner)
    return out


def _decode_chunk(meta: dict, raw: bytes) -> np.ndarray:
    if meta.get("shard_inner_shape") is not None:
        return _decode_shard(meta, raw)
    return _decode_block(meta, raw, meta["chunk_shape"])


def _crop(meta: dict, idx: tuple[int, ...], block: np.ndarray) -> np.ndarray:
    """Crop an edge chunk back to the array bounds (spec: stored full-size)."""
    sel = tuple(
        slice(0, min((i + 1) * c, s) - i * c)
        for i, c, s in zip(idx, meta["chunk_shape"], meta["shape"])
    )
    return block[sel]


def read_array(root: str, array_path: str) -> np.ndarray:
    """Driver-side full-array read (tests / small coordinate arrays)."""
    meta = open_store(root)[array_path]
    if meta["node_type"] != "array":
        raise ValueError(f"{array_path} is a group")
    out = np.full(
        meta["shape"],
        meta["fill_value"],
        dtype=np.dtype(DTYPES[meta["data_type"]]),
    )
    base = os.path.join(root, array_path)
    for idx in np.ndindex(*meta["chunk_grid"]):
        key = os.path.join(base, "c", *(str(i) for i in idx))
        if not os.path.isfile(key):
            continue  # missing chunk = fill_value per spec
        with open(key, "rb") as f:
            block = _crop(meta, idx, _decode_chunk(meta, f.read()))
        sel = tuple(
            slice(i * c, i * c + e)
            for i, c, e in zip(idx, meta["chunk_shape"], block.shape)
        )
        out[sel] = block
    return out


CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("array_path", T.StringType(), False),
        T.StructField("cy", T.LongType(), False),
        T.StructField("cx", T.LongType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), False),  # raw little-endian, cropped
        T.StructField("px_sum", T.DoubleType(), False),
        T.StructField("px_min", T.DoubleType(), False),
        T.StructField("px_max", T.DoubleType(), False),
        T.StructField("crc32", T.LongType(), False),
    ]
)


def chunks_df(spark: SparkSession, root: str, array_path: str) -> DataFrame:
    """Distributed decode of one 2-D array's chunks.

    ``binaryFile`` lists and reads the chunk objects Spark-side (no driver
    loop over contents); the pandas decode crops edge chunks and emits the
    cropped raw-LE bytes plus integer-exact per-chunk stats.  crc32 is over
    the cropped raw bytes — a driver-independent content fingerprint.
    """
    meta = open_store(root)[array_path]
    if len(meta["shape"]) != 2:
        raise ValueError("chunks_df handles 2-D arrays")
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(os.path.join(root, array_path, "c"))
        .select("path", "content")
    )

    def decode(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                parts = row.path.split("/c/", 1)[1].split("/")
                idx = tuple(int(p) for p in parts)
                block = _crop(meta, idx, _decode_chunk(meta, bytes(row.content)))
                le = np.ascontiguousarray(
                    block, dtype=block.dtype.newbyteorder("<")
                )
                recs.append(
                    {
                        "array_path": array_path,
                        "cy": idx[0],
                        "cx": idx[1],
                        "h": block.shape[0],
                        "w": block.shape[1],
                        "data": le.tobytes(),
                        "px_sum": float(block.astype("f8").sum()),
                        "px_min": float(block.min()),
                        "px_max": float(block.max()),
                        "crc32": zlib.crc32(le.tobytes()),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in CHUNK_SCHEMA.fields}
            )

    return files.mapInPandas(decode, CHUNK_SCHEMA)


def store_chunks_df(
    spark: SparkSession, root: str, metas: dict[str, dict]
) -> DataFrame:
    """Distributed decode of MANY arrays' chunks in ONE ``binaryFile`` scan.

    Same per-chunk rows as ``chunks_df`` but with a single file listing and
    a single scan stage across every array in ``metas`` (path -> validated
    array metadata, as returned by ``open_store``) — for store-wide
    consumers like the round-trip fingerprint queries, where one scan per
    array would pay the listing/scan fixed cost dozens of times.
    """
    root = os.path.abspath(root)
    paths = sorted(p for p, m in metas.items() if m["node_type"] == "array")
    for p in paths:
        if len(metas[p]["shape"]) != 2:
            raise ValueError("store_chunks_df handles 2-D arrays")
    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load([os.path.join(root, p, "c") for p in paths])
        .select("path", "content")
    )
    metas = {p: metas[p] for p in paths}

    def decode(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                prefix, chunk = row.path.split("/c/", 1)
                if prefix.startswith("file:"):
                    prefix = prefix[5:]
                apath = os.path.relpath(prefix, root)
                meta = metas[apath]
                idx = tuple(int(p) for p in chunk.split("/"))
                block = _crop(meta, idx, _decode_chunk(meta, bytes(row.content)))
                le = np.ascontiguousarray(
                    block, dtype=block.dtype.newbyteorder("<")
                )
                recs.append(
                    {
                        "array_path": apath,
                        "cy": idx[0],
                        "cx": idx[1],
                        "h": block.shape[0],
                        "w": block.shape[1],
                        "data": le.tobytes(),
                        "px_sum": float(block.astype("f8").sum()),
                        "px_min": float(block.min()),
                        "px_max": float(block.max()),
                        "crc32": zlib.crc32(le.tobytes()),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in CHUNK_SCHEMA.fields}
            )

    return files.mapInPandas(decode, CHUNK_SCHEMA)


# ---------------------------------------------------------------------------
# zarr store -> tile pyramid (the reference `convert` entry, cli.py:174-179)
# ---------------------------------------------------------------------------


def zarr_tiles(
    spark: SparkSession,
    root: str,
    array_paths: list[str] | None = None,
    min_dimension: int = 64,
) -> DataFrame:
    """Cut every (or the named) uint16 2-D array into tile-pyramid fragments.

    Geo-anchoring follows the GeoZarr convention the engine writes: array
    ``attributes`` carry ``x0`` (west edge, m), ``y0_top`` (north edge, m)
    and ``pixel_m``; band name comes from ``band`` or the node basename.
    Each CHUNK becomes one ``tiles_for_image`` cut — identical math to the
    image-table path, so the two ingestion front-ends compose with the
    same merge/sink back-end.  Feed the result to ``tiling.merge_tiles``.
    """
    from ..functions import gridlib
    from ..operators.tiling import TILE_SCHEMA, tiles_for_image

    nodes = open_store(root)
    if array_paths is None:
        array_paths = [
            p
            for p, m in nodes.items()
            if m["node_type"] == "array"
            and len(m["shape"]) == 2
            and m["data_type"] == "uint16"
        ]
    frags = []
    for apath in array_paths:
        meta = nodes[apath]
        attrs = meta["attributes"]
        x0 = float(attrs["x0"])
        y0_top = float(attrs["y0_top"])
        pixel_m = float(attrs.get("pixel_m", 10.0))
        var = attrs.get("band", apath.rsplit("/", 1)[-1])
        ch = meta["chunk_shape"][0]
        cw = meta["chunk_shape"][1]
        # pyramid depth comes from the ARRAY dims; per-chunk cuts compose
        # exactly only while 2^level divides the chunk shape (alignment of
        # chunk offsets with the level's block grid), so cap levels there
        ah, aw = meta["shape"]
        levels = [
            lv["level"]
            for lv in gridlib.overview_levels(aw, ah, min_dimension=min_dimension)
            if ch % (1 << lv["level"]) == 0 and cw % (1 << lv["level"]) == 0
        ]

        def cut(batches, apath=apath, x0=x0, y0_top=y0_top, pixel_m=pixel_m,
                var=var, ch=ch, cw=cw, levels=levels):
            for pdf in batches:
                recs = []
                for row in pdf.itertuples(index=False):
                    arr = np.frombuffer(bytes(row.data), dtype="<u2").reshape(
                        row.h, row.w
                    )
                    ax = x0 + row.cx * cw * pixel_m
                    ay = y0_top - (row.cy * ch + row.h) * pixel_m
                    recs.extend(
                        tiles_for_image(
                            f"{apath}@c/{row.cy}/{row.cx}",
                            arr,
                            ax,
                            ay,
                            pixel_m=pixel_m,
                            min_dimension=min_dimension,
                            var_name=var,
                            level_numbers=levels,
                        )
                    )
                yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                    {f.name: pd.Series(dtype="object") for f in TILE_SCHEMA.fields}
                )

        frags.append(
            chunks_df(spark, root, apath)
            .select("cy", "cx", "h", "w", "data")
            .mapInPandas(cut, TILE_SCHEMA)
        )
    if not frags:
        raise ValueError(f"{root}: no 2-D uint16 arrays to convert")
    out = frags[0]
    for f2 in frags[1:]:
        out = out.unionByName(f2)
    return out


def store_info(root: str) -> dict:
    """Hierarchy summary (the reference ``info`` command, cli.py:1166-1206)."""
    nodes = open_store(root)
    return {
        "root": root,
        "n_groups": sum(1 for m in nodes.values() if m["node_type"] == "group"),
        "n_arrays": sum(1 for m in nodes.values() if m["node_type"] == "array"),
        "nodes": [
            {
                "path": m["path"] or "/",
                "node_type": m["node_type"],
                **(
                    {
                        "shape": m["shape"],
                        "data_type": m["data_type"],
                        "chunk_shape": m["chunk_shape"],
                        "n_chunks": m["n_chunks"],
                    }
                    if m["node_type"] == "array"
                    else {}
                ),
            }
            for m in sorted(nodes.values(), key=lambda m: m["path"])
        ],
    }
