"""Zarr v3 ingestion queries: store -> distributed chunk scan, oracle-backed.

The reference's entry point is opening a Zarr store (``cli.py:174-179``);
``zarr_store_meta`` proves the engine's equivalent front-end end-to-end —
write a deterministic store to disk with the pure-Python writer, scan its
chunk objects through Spark's distributed ``binaryFile`` source, decode
and fingerprint each chunk — against a DuckDB VALUES oracle computed by a
pure-NumPy replay that never touches the store.  A hash match proves the
writer, the spec-compliant edge-chunk pad/crop, the gzip/bytes codec
chain, and the distributed decode all compose to exactly the intended
array content.

The fixture content is a closed-form function of (y, x) — no RNG — so the
oracle replay is trivially independent of the store bytes.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import zarr_store as Z
from .registry import register

_FIXTURE_VERSION = "v1"

#: (array node path, shape, chunk_shape, gzip_level) — shapes chosen so every
#: array has EDGE chunks on both axes (pad/crop is always exercised)
_ARRAYS = [
    ("measurements/b02", (300, 500), (128, 128), 5),
    ("measurements/scl", (97, 211), (64, 64), None),
]


def _synth(shape: tuple[int, int]) -> np.ndarray:
    """Closed-form deterministic uint16 content (replayable without I/O)."""
    y = np.arange(shape[0], dtype=np.int64)[:, None]
    x = np.arange(shape[1], dtype=np.int64)[None, :]
    return ((1234 + 7 * y + 13 * x + (y * x) % 997) % 5000).astype(np.uint16)


def fixture_store() -> str:
    """Build (once, atomically) and return the fixture store path."""
    root = os.path.join(
        tempfile.gettempdir(), f"dms_zarr_fixture_{_FIXTURE_VERSION}"
    )
    if os.path.isfile(os.path.join(root, "zarr.json")):
        return root
    tmp = f"{root}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    Z.write_group(tmp, {"title": "dms zarr fixture", "version": _FIXTURE_VERSION})
    Z.write_group(os.path.join(tmp, "measurements"))
    for apath, shape, cshape, gz in _ARRAYS:
        Z.write_array(
            os.path.join(tmp, apath),
            _synth(shape),
            cshape,
            attributes={
                "x0": 600000.0,
                "y0_top": 5090000.0 + shape[0] * 10.0,
                "pixel_m": 10.0,
                "band": apath.rsplit("/", 1)[-1],
            },
            dimension_names=["y", "x"],
            gzip_level=gz,
        )
    try:
        os.rename(tmp, root)
    except OSError:  # lost the race: another process built it first
        shutil.rmtree(tmp, ignore_errors=True)
    return root


def _expected_rows() -> list[tuple]:
    """Pure-NumPy replay of every chunk fingerprint (no store I/O)."""
    rows = []
    for apath, shape, (ch, cw), _gz in _ARRAYS:
        arr = _synth(shape)
        for cy in range((shape[0] + ch - 1) // ch):
            for cx in range((shape[1] + cw - 1) // cw):
                blk = arr[cy * ch : (cy + 1) * ch, cx * cw : (cx + 1) * cw]
                le = np.ascontiguousarray(blk, dtype="<u2")
                rows.append(
                    (
                        apath,
                        cy,
                        cx,
                        blk.shape[0],
                        blk.shape[1],
                        float(blk.astype("f8").sum()),
                        float(blk.min()),
                        float(blk.max()),
                        zlib.crc32(le.tobytes()),
                    )
                )
    return rows


def _oracle() -> str:
    vals = ", ".join(
        f"('{p}', {cy}, {cx}, {h}, {w}, {s!r}, {mn!r}, {mx!r}, {crc})"
        for p, cy, cx, h, w, s, mn, mx, crc in _expected_rows()
    )
    return f"""
WITH v(array_path, cy, cx, h, w, px_sum, px_min, px_max, crc32) AS (VALUES {vals})
SELECT array_path, CAST(cy AS BIGINT) AS cy, CAST(cx AS BIGINT) AS cx,
       CAST(h AS INTEGER) AS h, CAST(w AS INTEGER) AS w,
       CAST(px_sum AS DOUBLE) AS px_sum, CAST(px_min AS DOUBLE) AS px_min,
       CAST(px_max AS DOUBLE) AS px_max, CAST(crc32 AS BIGINT) AS crc32
FROM v"""


@register("zarr_store_meta", _oracle)
def zarr_store_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed chunk fingerprints of the on-disk Zarr fixture store."""
    root = fixture_store()
    out = None
    for apath, _shape, _cshape, _gz in _ARRAYS:
        df = Z.chunks_df(spark, root, apath).drop("data")
        out = df if out is None else out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# sharded store round-trip (sharding_indexed, ZEP 2)
#
# Same contract as ``zarr_store_meta`` over a SHARDED fixture: per-shard
# fingerprints of the distributed decode vs a pure-NumPy replay.  The
# fixture covers both index locations, gzip and raw inner chains, edge
# shards on both axes, and one deliberately MISSING inner chunk (knocked
# out of shard (0,0) after the write) so the fill_value path is part of
# the hash, not just a unit test.
# ---------------------------------------------------------------------------

_SHARD_FIXTURE_VERSION = "v1"

#: (path, shape, inner_chunk, shard_shape, gzip_level, index_location)
_SHARD_ARRAYS = [
    ("measurements/b02s", (300, 500), (32, 32), (128, 128), 5, "end"),
    ("measurements/scls", (97, 211), (16, 16), (64, 64), None, "start"),
]

#: inner chunk (1,1) of shard (0,0) of the FIRST array is removed
_MISSING = ("measurements/b02s", (0, 0), (1, 1))


def _knockout_inner(root: str) -> None:
    """Re-encode one shard with one inner chunk omitted (missing sentinel)."""
    apath, (sy, sx), kill = _MISSING
    spec = next(s for s in _SHARD_ARRAYS if s[0] == apath)
    _, shape, inner, shard, gz, loc = spec
    arr = _synth(shape)
    block = Z._pad_block(arr, (sy, sx), shard, 0)
    inner_grid = tuple(s // c for s, c in zip(shard, inner))
    payloads = {
        iidx: (
            None
            if iidx == kill
            else Z._encode_block(Z._pad_block(block, iidx, inner, 0), gz)
        )
        for iidx in np.ndindex(*inner_grid)
    }
    key = os.path.join(root, apath, "c", str(sy), str(sx))
    with open(key, "wb") as f:
        f.write(Z.encode_shard(payloads, inner_grid, loc))


def sharded_fixture_store() -> str:
    root = os.path.join(
        tempfile.gettempdir(), f"dms_zarr_shard_fixture_{_SHARD_FIXTURE_VERSION}"
    )
    if os.path.isfile(os.path.join(root, "zarr.json")):
        return root
    tmp = f"{root}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    Z.write_group(tmp, {"title": "dms sharded zarr fixture"})
    Z.write_group(os.path.join(tmp, "measurements"))
    for apath, shape, inner, shard, gz, loc in _SHARD_ARRAYS:
        Z.write_array(
            os.path.join(tmp, apath),
            _synth(shape),
            inner,
            dimension_names=["y", "x"],
            gzip_level=gz,
            shards=shard,
            index_location=loc,
        )
    _knockout_inner(tmp)
    try:
        os.rename(tmp, root)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return root


def _sharded_expected_rows() -> list[tuple]:
    """NumPy replay: synth content with the knocked-out inner block zeroed
    (fill_value), fingerprinted per SHARD (the stored chunk unit)."""
    rows = []
    for apath, shape, inner, (sh, sw), _gz, _loc in _SHARD_ARRAYS:
        arr = _synth(shape).copy()
        if apath == _MISSING[0]:
            (sy, sx), (ky, kx) = _MISSING[1], _MISSING[2]
            y0 = sy * sh + ky * inner[0]
            x0 = sx * sw + kx * inner[1]
            arr[y0 : y0 + inner[0], x0 : x0 + inner[1]] = 0
        for cy in range((shape[0] + sh - 1) // sh):
            for cx in range((shape[1] + sw - 1) // sw):
                blk = arr[cy * sh : (cy + 1) * sh, cx * sw : (cx + 1) * sw]
                le = np.ascontiguousarray(blk, dtype="<u2")
                rows.append(
                    (
                        apath,
                        cy,
                        cx,
                        blk.shape[0],
                        blk.shape[1],
                        float(blk.astype("f8").sum()),
                        float(blk.min()),
                        float(blk.max()),
                        zlib.crc32(le.tobytes()),
                    )
                )
    return rows


def _sharded_oracle() -> str:
    vals = ", ".join(
        f"('{p}', {cy}, {cx}, {h}, {w}, {s!r}, {mn!r}, {mx!r}, {crc})"
        for p, cy, cx, h, w, s, mn, mx, crc in _sharded_expected_rows()
    )
    return f"""
WITH v(array_path, cy, cx, h, w, px_sum, px_min, px_max, crc32) AS (VALUES {vals})
SELECT array_path, CAST(cy AS BIGINT) AS cy, CAST(cx AS BIGINT) AS cx,
       CAST(h AS INTEGER) AS h, CAST(w AS INTEGER) AS w,
       CAST(px_sum AS DOUBLE) AS px_sum, CAST(px_min AS DOUBLE) AS px_min,
       CAST(px_max AS DOUBLE) AS px_max, CAST(crc32 AS BIGINT) AS crc32
FROM v"""


@register("zarr_sharded_rt", _sharded_oracle)
def zarr_sharded_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed per-shard fingerprints of the sharded Zarr fixture."""
    root = sharded_fixture_store()
    out = None
    for apath, *_rest in _SHARD_ARRAYS:
        df = Z.chunks_df(spark, root, apath).drop("data")
        out = df if out is None else out.unionByName(df)
    return out
