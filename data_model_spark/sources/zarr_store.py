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
  followed by the ``gzip`` bytes->bytes codec (zlib — stdlib).  Sharding
  and transpose are out of scope and rejected explicitly.
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


def write_array(
    path: str,
    arr: np.ndarray,
    chunk_shape: tuple[int, ...],
    attributes: dict | None = None,
    dimension_names: list[str] | None = None,
    gzip_level: int | None = 5,
    fill_value: float = 0,
) -> None:
    """Write one array node: ``zarr.json`` + full-size chunk objects.

    Edge chunks are padded with ``fill_value`` to ``chunk_shape`` as the
    spec requires; the reader crops them back against ``shape``.
    """
    if arr.ndim != len(chunk_shape):
        raise ValueError("chunk_shape rank must match array rank")
    dt_name = {v: k for k, v in DTYPES.items()}.get(arr.dtype.str.lstrip("<>|="))
    if dt_name is None:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    codecs: list[dict] = [{"name": "bytes", "configuration": {"endian": "little"}}]
    if gzip_level is not None:
        codecs.append({"name": "gzip", "configuration": {"level": gzip_level}})
    doc = {
        "zarr_format": ZARR_FORMAT,
        "node_type": "array",
        "shape": list(arr.shape),
        "data_type": dt_name,
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": list(chunk_shape)},
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
        (arr.shape[d] + chunk_shape[d] - 1) // chunk_shape[d]
        for d in range(arr.ndim)
    ]
    le = arr.dtype.newbyteorder("<")
    for idx in np.ndindex(*grid):
        sel = tuple(
            slice(i * c, min((i + 1) * c, s))
            for i, c, s in zip(idx, chunk_shape, arr.shape)
        )
        block = arr[sel]
        if block.shape != tuple(chunk_shape):  # pad edge chunk to full size
            full = np.full(chunk_shape, fill_value, dtype=arr.dtype)
            full[tuple(slice(0, e) for e in block.shape)] = block
            block = full
        raw = np.ascontiguousarray(block, dtype=le).tobytes()
        if gzip_level is not None:
            raw = zlib.compress(raw, gzip_level)
        key = os.path.join(path, "c", *(str(i) for i in idx))
        os.makedirs(os.path.dirname(key), exist_ok=True)
        with open(key, "wb") as f:
            f.write(raw)


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
    names = [c["name"] for c in doc["codecs"]]
    if names not in (["bytes"], ["bytes", "gzip"]):
        raise ValueError(
            f"{rel}: unsupported codec chain {names} (supported: bytes[, gzip])"
        )
    if doc["data_type"] not in DTYPES:
        raise ValueError(f"{rel}: unsupported data_type {doc['data_type']}")
    endian = doc["codecs"][0].get("configuration", {}).get("endian", "little")
    shape = [int(s) for s in doc["shape"]]
    chunk_shape = [
        int(c) for c in doc["chunk_grid"]["configuration"]["chunk_shape"]
    ]
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


def _decode_chunk(meta: dict, raw: bytes) -> np.ndarray:
    if meta["gzip"]:
        raw = zlib.decompress(raw)
    dt = np.dtype(DTYPES[meta["data_type"]]).newbyteorder(
        "<" if meta["endian"] == "little" else ">"
    )
    n = int(np.prod(meta["chunk_shape"]))
    if len(raw) != n * dt.itemsize:
        raise ValueError(
            f"{meta['path']}: chunk payload {len(raw)}B != {n * dt.itemsize}B"
        )
    return np.frombuffer(raw, dtype=dt).reshape(meta["chunk_shape"])


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
