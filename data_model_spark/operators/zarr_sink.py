"""GeoZarr-shaped Zarr v3 store SINK: merged tile table -> on-disk store.

Closes the reference's full convert loop on the output side: the
reference's ``convert`` WRITES a GeoZarr store (band-by-band datasets
with multiscales + CF/STAC attributes, ``conversion/geozarr.py:974-1183``,
attribute round-trips pinned by its metadata tests).  The engine's
equivalent writes the merged tile table as a Zarr v3 hierarchy:

    <root>/zarr.json                      group, multiscales attributes
    <root>/<var>/zarr.json               per-band group
    <root>/<var>/<level>/zarr.json       2-D uint16 array, 256x256 chunks
    <root>/<var>/<level>/c/<cy>/<cx>     one chunk object PER MERGED TILE

Chunk == tile: the write is embarrassingly parallel (``mapInPandas``
writes each partition's tiles as independent chunk objects, no shuffle —
the tile table is already the unit of parallelism), and absent tiles are
absent chunks = ``fill_value`` per the spec, so sparse coverage costs
nothing.  Geo-anchoring (x0 / y0_top / pixel_m) and the CF-style
dimension names land in array attributes, which makes the written store
round-trip through the INGESTION path (``sources/zarr_store.zarr_tiles``)
— read-back equality is the e2e gate in tests/test_zarr_sink.py.

At 10^12 tiles the driver-side work is one bounded agg (per-(var, level)
tile extents — vars x levels rows) for the metadata documents; every
chunk byte moves executor-side.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import zarr_store as Z
from .registry import register
from .tiling import TILE_PX

_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("var", T.StringType(), False),
        T.StructField("level", T.IntegerType(), False),
        T.StructField("cy", T.LongType(), False),
        T.StructField("cx", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("crc32", T.LongType(), False),
    ]
)


def write_geozarr(
    tiles: DataFrame,
    path: str,
    pixel_m: float = 10.0,
    epsg: int = 32632,
    gzip_level: int | None = 5,
    shard_tiles: int | None = None,
) -> DataFrame:
    """Write the merged tile table as a Zarr v3 store; return the manifest.

    ``tiles``: (var, level, tile_x, tile_y, data raw-u16 256x256, ...).
    The manifest DataFrame (one row per written chunk) is the write-side
    lineage — the same role the resumable sink's checkpoint rows play.

    ``shard_tiles=K`` writes K x K-tile ``sharding_indexed`` shard objects
    instead of one object per tile (reference ``enable_sharding``).  The
    write then shuffles ONCE on the shard key — the same shard-aligned
    repartition a 10^12-tile run needs anyway so each output object has
    exactly one writer — and assembles each shard in a single
    ``applyInPandas`` group (missing tiles stay missing in the shard
    index = ``fill_value`` on read, so sparse coverage still costs
    nothing).
    """
    # bounded driver-side metadata pass: per-(var, level) tile extents
    extents = (
        tiles.groupBy("var", "level")
        .agg(
            F.min("tile_x").alias("tx0"),
            F.max("tile_x").alias("tx1"),
            F.min("tile_y").alias("ty0"),
            F.max("tile_y").alias("ty1"),
        )
        .collect()
    )
    if not extents:
        raise ValueError("empty tile table")
    Z.write_group(path, {"note": "written by data_model_spark zarr_sink"})
    ext = {}
    by_var: dict[str, list] = {}
    for r in extents:
        ext[(r["var"], int(r["level"]))] = (
            int(r["tx0"]), int(r["tx1"]), int(r["ty0"]), int(r["ty1"])
        )
        by_var.setdefault(r["var"], []).append(int(r["level"]))
    for var, levels in sorted(by_var.items()):
        # per-band group with the reference's multiscales shape: one entry
        # per level, finest first (conversion/geozarr.py's layout contract)
        ms = []
        for lv in sorted(levels):
            tx0, tx1, ty0, ty1 = ext[(var, lv)]
            px = pixel_m * (1 << lv)
            ms.append(
                {
                    "asset": str(lv),
                    "scale": [px, px],
                    "translation": [tx0 * TILE_PX * px, (ty1 + 1) * TILE_PX * px],
                    "width": (tx1 - tx0 + 1) * TILE_PX,
                    "height": (ty1 - ty0 + 1) * TILE_PX,
                }
            )
        Z.write_group(
            os.path.join(path, var),
            {"multiscales": {"tile_matrix_set": f"EPSG:{epsg}", "layout": ms}},
        )
        for lv in sorted(levels):
            tx0, tx1, ty0, ty1 = ext[(var, lv)]
            px = pixel_m * (1 << lv)
            h = (ty1 - ty0 + 1) * TILE_PX
            w = (tx1 - tx0 + 1) * TILE_PX
            # array node metadata only — chunk objects are written by the
            # executors below; write_array would also write (empty) chunks,
            # so emit the zarr.json directly through the same helper on a
            # zero-size... instead: reuse write_array's doc by hand
            _write_array_meta(
                os.path.join(path, var, str(lv)),
                (h, w),
                attributes={
                    "band": var,
                    "x0": tx0 * TILE_PX * px,
                    "y0_top": (ty1 + 1) * TILE_PX * px,
                    "pixel_m": px,
                    "proj:code": f"EPSG:{epsg}",
                    "standard_name": "toa_bidirectional_reflectance",
                },
                gzip=gzip_level is not None,
                shard_tiles=shard_tiles,
            )

    b_ext = tiles.sparkSession.sparkContext.broadcast(ext)
    root = os.path.abspath(path)

    if shard_tiles is not None:
        return _write_sharded(
            tiles, root, b_ext, gzip_level, shard_tiles
        )

    def write_chunks(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                tx0, tx1, ty0, ty1 = b_ext.value[(row.var, int(row.level))]
                cy = ty1 - int(row.tile_y)  # north-up: row 0 = max tile_y
                cx = int(row.tile_x) - tx0
                raw = bytes(row.data)
                payload = (
                    zlib.compress(raw, gzip_level) if gzip_level is not None else raw
                )
                key = os.path.join(
                    root, row.var, str(int(row.level)), "c", str(cy), str(cx)
                )
                os.makedirs(os.path.dirname(key), exist_ok=True)
                tmp = f"{key}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, key)  # atomic publish, re-run idempotent
                recs.append(
                    {
                        "var": row.var,
                        "level": int(row.level),
                        "cy": cy,
                        "cx": cx,
                        "n_bytes": len(payload),
                        "crc32": zlib.crc32(raw),
                    }
                )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in _MANIFEST_SCHEMA.fields}
            )

    return tiles.select("var", "level", "tile_x", "tile_y", "data").mapInPandas(
        write_chunks, _MANIFEST_SCHEMA
    )


def _write_sharded(
    tiles: DataFrame,
    root: str,
    b_ext,
    gzip_level: int | None,
    shard_tiles: int,
) -> DataFrame:
    """Shard-grouped write: one shuffle on (var, level, sy, sx), one
    writer per shard object.  Shard keys come from a broadcast join with
    the (vars x levels)-row extents table — no per-row Python."""
    spark = tiles.sparkSession
    ext_rows = [
        (var, lv, tx0, ty1)
        for (var, lv), (tx0, _tx1, _ty0, ty1) in sorted(b_ext.value.items())
    ]
    from ..sources.tables import local_df

    ext_df = F.broadcast(
        local_df(spark, ext_rows, "var string, level int, tx0 long, ty1 long")
    )
    keyed = (
        tiles.select("var", "level", "tile_x", "tile_y", "data")
        .join(ext_df, ["var", "level"])
        .select(
            "var",
            "level",
            "data",
            (F.col("ty1") - F.col("tile_y")).alias("cy"),
            (F.col("tile_x") - F.col("tx0")).alias("cx"),
        )
        .select(
            "var", "level", "data", "cy", "cx",
            F.floor(F.col("cy") / shard_tiles).alias("sy"),
            F.floor(F.col("cx") / shard_tiles).alias("sx"),
        )
    )

    def write_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        var, level, sy, sx = key[0], int(key[1]), int(key[2]), int(key[3])
        payloads = {}
        for row in pdf.itertuples(index=False):
            raw = bytes(row.data)
            payloads[(int(row.cy) % shard_tiles, int(row.cx) % shard_tiles)] = (
                zlib.compress(raw, gzip_level) if gzip_level is not None else raw
            )
        shard = Z.encode_shard(payloads, (shard_tiles, shard_tiles), "end")
        key_path = os.path.join(root, var, str(level), "c", str(sy), str(sx))
        os.makedirs(os.path.dirname(key_path), exist_ok=True)
        tmp = f"{key_path}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(shard)
        os.replace(tmp, key_path)
        return pd.DataFrame.from_records(
            [
                {
                    "var": var,
                    "level": level,
                    "cy": sy,
                    "cx": sx,
                    "n_bytes": len(shard),
                    "crc32": zlib.crc32(shard),
                }
            ]
        )

    return keyed.groupBy("var", "level", "sy", "sx").applyInPandas(
        write_shard, _MANIFEST_SCHEMA
    )


def _write_array_meta(
    path: str,
    shape: tuple[int, int],
    attributes: dict,
    gzip: bool,
    shard_tiles: int | None = None,
) -> None:
    """Array ``zarr.json`` without touching chunk objects.

    Endianness is declared BIG: the engine's ``raw-u16`` tile codec is
    big-endian, so the sink publishes tile bytes as-is (zero-copy) and
    lets the spec-compliant ``bytes`` codec configuration carry the fact;
    the reader (``zarr_store._decode_chunk``) honors either endian.

    With ``shard_tiles=K`` the stored unit is a K x K-tile shard
    (``sharding_indexed``; inner chunk = one tile) — the reference's
    optional ``enable_sharding`` encoding (geozarr.py:1077-1093).
    """
    import json

    codecs = [{"name": "bytes", "configuration": {"endian": "big"}}]
    if gzip:
        codecs.append({"name": "gzip", "configuration": {"level": 5}})
    if shard_tiles is not None:
        codecs = [
            {
                "name": "sharding_indexed",
                "configuration": {
                    "chunk_shape": [TILE_PX, TILE_PX],
                    "codecs": codecs,
                    "index_codecs": [
                        {"name": "bytes", "configuration": {"endian": "little"}},
                        {"name": "crc32c"},
                    ],
                    "index_location": "end",
                },
            }
        ]
    stored = TILE_PX * (shard_tiles or 1)
    doc = {
        "zarr_format": Z.ZARR_FORMAT,
        "node_type": "array",
        "shape": list(shape),
        "data_type": "uint16",
        "chunk_grid": {
            "name": "regular",
            "configuration": {"chunk_shape": [stored, stored]},
        },
        "chunk_key_encoding": {
            "name": "default",
            "configuration": {"separator": "/"},
        },
        "fill_value": 0,
        "codecs": codecs,
        "attributes": attributes,
        "dimension_names": ["y", "x"],
    }
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump(doc, f, sort_keys=True)


# ---------------------------------------------------------------------------
# registered query: write the flagship mosaic as GeoZarr, read it BACK
# through the ingestion reader, fingerprint per (var, level) — the oracle
# replays the expected sums/tile-counts from scene geometry alone
# ---------------------------------------------------------------------------

_N_IMG = 26  # two full band cycles (matches flagship_multiband)


def _rt_oracle() -> str:
    from .pipeline_queries import _pyramid_vals

    vals = _pyramid_vals((f"img_{i:012d}", i) for i in range(_N_IMG))
    return f"""
WITH v(var, level, ax, top, lw, lh, px, sumv, minv, maxv) AS (VALUES
  {", ".join(vals)}),
g AS (SELECT *, 256.0 * px AS tm FROM v)
SELECT var, CAST(level AS INTEGER) AS level,
       CAST(SUM((FLOOR((ax + lw * px - 1e-9) / tm) - FLOOR(ax / tm) + 1)
              * (FLOOR((top - 1e-9) / tm) - FLOOR((top - lh * px + 1e-9) / tm) + 1))
            AS BIGINT) AS n_chunks,
       ROUND(SUM(sumv), 3) AS sum_value
FROM g GROUP BY var, level"""


@register("geozarr_store_rt", _rt_oracle)
def geozarr_store_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full write->read round-trip: flagship mosaic -> GeoZarr store on
    disk -> distributed chunk scan of the WRITTEN FILES -> per-(band,
    level) fingerprints, hash-checked against the direct-kernel pyramid
    replay (which never sees the store).  Equality proves the sink's
    chunk placement, codec chain and metadata anchor the exact mosaic."""
    import shutil
    import tempfile

    from ..cache import track
    from ..sources.images import generate_images_df
    from . import tiling

    base = tempfile.mkdtemp(prefix="dms_geozarr_rt_")
    try:
        store = os.path.join(base, "out.zarr")
        images = generate_images_df(spark, _N_IMG)
        # persisted: write_geozarr runs two jobs over the mosaic (extents
        # agg + chunk write) — without the cache the whole decode->tile->
        # merge fixture pipeline executes twice
        merged = track(
            tiling.merge_tiles(
                tiling.build_tiles(images, min_dimension=64, repartition=False)
            )
        )
        write_geozarr(merged, store).count()  # materialize the write
        nodes = Z.open_store(store)
        arrays = {p: m for p, m in nodes.items() if m["node_type"] == "array"}
        # ONE binaryFile scan across every array (was: one scan per array,
        # ~40 listing+scan fixed costs); per-chunk px_sum values are exact
        # integers in f8, so the grouped sum is order-insensitive
        out = (
            Z.store_chunks_df(spark, store, arrays)
            .groupBy(
                F.split("array_path", "/").getItem(0).alias("var"),
                F.split("array_path", "/").getItem(1).cast("int").alias("level"),
            )
            .agg(
                F.count("*").alias("n_chunks"),
                F.round(F.sum("px_sum"), 3).alias("sum_value"),
            )
        )
        # self-contained local relation: the temp store is removed below
        rows = sorted(tuple(r) for r in out.collect())
        from ..sources.tables import local_df

        return local_df(
            spark, rows, "var string, level int, n_chunks long, sum_value double"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# registered query: the SHARDED write -> read-back round-trip
# ---------------------------------------------------------------------------

_SHARD_K = 2  # 2x2-tile shards: every (var, level) gets multi-tile AND
#               edge shards at _N_IMG=26, so assembly + missing entries
#               and the index path are all non-vacuous


def _sharded_rt_oracle() -> str:
    """Pyramid sums (direct-kernel replay) x shard counts (tile-key-union
    geometry replay grouped to the K x K shard grid) — neither touches
    the store."""
    from .pipeline_queries import _pyramid_vals, _tile_geometry_replay

    units, _ = _tile_geometry_replay(_N_IMG)
    shard_rows = []
    for (var, lv), keys in sorted(units.items()):
        tx0 = min(tx for tx, _ in keys)
        ty1 = max(ty for _, ty in keys)
        shards = {
            ((ty1 - ty) // _SHARD_K, (tx - tx0) // _SHARD_K) for tx, ty in keys
        }
        shard_rows.append(f"('{var}', {lv}, {len(shards)})")
    vals = _pyramid_vals((f"img_{i:012d}", i) for i in range(_N_IMG))
    return f"""
WITH v(var, level, ax, top, lw, lh, px, sumv, minv, maxv) AS (VALUES
  {", ".join(vals)}),
s(var, level, n_chunks) AS (VALUES {", ".join(shard_rows)}),
g AS (SELECT var, level, ROUND(SUM(sumv), 3) AS sum_value
      FROM v GROUP BY var, level)
SELECT g.var, CAST(g.level AS INTEGER) AS level,
       CAST(s.n_chunks AS BIGINT) AS n_chunks, g.sum_value
FROM g JOIN s ON g.var = s.var AND g.level = s.level"""


@register("geozarr_sharded_rt", _sharded_rt_oracle)
def geozarr_sharded_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geozarr_store_rt`` with ``shard_tiles=2``: mosaic -> sharded
    GeoZarr store -> distributed shard scan -> per-(band, level)
    fingerprints.  Equality proves the shard-grouped shuffle write, the
    index encode/decode, and missing-inner-chunk semantics conserve the
    exact mosaic."""
    import shutil
    import tempfile

    from ..cache import track
    from ..sources.images import generate_images_df
    from . import tiling

    base = tempfile.mkdtemp(prefix="dms_geozarr_srt_")
    try:
        store = os.path.join(base, "out.zarr")
        images = generate_images_df(spark, _N_IMG)
        merged = track(
            tiling.merge_tiles(
                tiling.build_tiles(images, min_dimension=64, repartition=False)
            )
        )
        write_geozarr(merged, store, shard_tiles=_SHARD_K).count()
        nodes = Z.open_store(store)
        arrays = {p: m for p, m in nodes.items() if m["node_type"] == "array"}
        out = (
            Z.store_chunks_df(spark, store, arrays)
            .groupBy(
                F.split("array_path", "/").getItem(0).alias("var"),
                F.split("array_path", "/").getItem(1).cast("int").alias("level"),
            )
            .agg(
                F.count("*").alias("n_chunks"),
                F.round(F.sum("px_sum"), 3).alias("sum_value"),
            )
        )
        rows = sorted(tuple(r) for r in out.collect())
        from ..sources.tables import local_df

        return local_df(
            spark, rows, "var string, level int, n_chunks long, sum_value double"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# registered query: the written store's LAYOUT DOCUMENTS, validated
# ---------------------------------------------------------------------------


def _layout_docs_replay() -> list[tuple[str, str, str, int]]:
    """Replay the sink's metadata from geometry alone: tile-key unions ->
    extents -> multiscales layout -> the exact documents
    ``docs_from_zarr_store`` derives, with issue count 0 (what the rule
    set must find for a spec-clean store).  No store I/O, no engine
    metadata code."""
    import json as _json

    from .pipeline_queries import _tile_geometry_replay

    units, _ = _tile_geometry_replay(_N_IMG)
    by_var: dict[str, dict[int, tuple]] = {}
    for (var, lv), keys in units.items():
        tx0 = min(tx for tx, _ in keys)
        tx1 = max(tx for tx, _ in keys)
        ty0 = min(ty for _, ty in keys)
        ty1 = max(ty for _, ty in keys)
        by_var.setdefault(var, {})[lv] = (tx0, tx1, ty0, ty1)
    rows = []
    for var, levels in sorted(by_var.items()):
        finest = min(levels)
        tx0, tx1, ty0, ty1 = levels[finest]
        px = 10.0 * (1 << finest)
        tx = tx0 * TILE_PX * px
        ty = (ty1 + 1) * TILE_PX * px
        w = (tx1 - tx0 + 1) * TILE_PX
        h = (ty1 - ty0 + 1) * TILE_PX
        store_doc = {
            "spatial:bbox": [tx, ty - h * px, tx + w * px, ty],
            "proj:code": "EPSG:32632",
        }
        rows.append((var, "store", _json.dumps(store_doc, sort_keys=True), 0))
        for lv in sorted(levels):
            tx0, tx1, ty0, ty1 = levels[lv]
            epx = 10.0 * (1 << lv)
            d = {
                "spatial:shape": [
                    (ty1 - ty0 + 1) * TILE_PX,
                    (tx1 - tx0 + 1) * TILE_PX,
                ],
                "spatial:transform": [
                    epx, 0.0, tx0 * TILE_PX * epx,
                    0.0, -epx, (ty1 + 1) * TILE_PX * epx,
                ],
                "standard_name": "toa_bidirectional_reflectance",
            }
            rows.append(
                (f"{var}/{lv}", "level", _json.dumps(d, sort_keys=True), 0)
            )
    return rows


def _layout_validate_oracle() -> str:
    from .mosaic_fp import _values_sql

    return _values_sql(
        [
            ("store_id", "VARCHAR"),
            ("doc_type", "VARCHAR"),
            ("doc", "VARCHAR"),
            ("n_issues", "INTEGER"),
        ],
        _layout_docs_replay(),
    )


@register("store_layout_validate", _layout_validate_oracle)
def store_layout_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the flagship mosaic as a GeoZarr store, derive its layout
    documents (``validate --zarr`` bridge) and count rule violations per
    document.  Hash-matching the geometry replay proves the sink's
    multiscales anchors/extents equal pure scene geometry AND that the
    written store passes the full compliance rule set (all counts 0)."""
    import shutil
    import tempfile

    from ..sources.images import generate_images_df
    from ..sources.tables import local_df
    from . import tiling
    from .validate import docs_from_zarr_store, validate_docs

    base = tempfile.mkdtemp(prefix="dms_layout_val_")
    try:
        store = os.path.join(base, "out.zarr")
        from ..cache import track

        images = generate_images_df(spark, _N_IMG)
        merged = track(
            tiling.merge_tiles(
                tiling.build_tiles(images, min_dimension=64, repartition=False)
            )
        )
        write_geozarr(merged, store).count()
        docs = docs_from_zarr_store(store)
        docs_df = local_df(
            spark, docs, "store_id string, doc_type string, doc string"
        )
        issues = (
            validate_docs(docs_df)
            .groupBy("store_id", "doc_type")
            .agg(F.count("*").alias("n_issues"))
        )
        return (
            docs_df.join(issues, ["store_id", "doc_type"], "left")
            .select(
                "store_id",
                "doc_type",
                "doc",
                F.coalesce("n_issues", F.lit(0)).cast("int").alias("n_issues"),
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
