"""GeoZarr store sink: write-side round-trip gates.

The e2e contract: merged tile table -> `write_geozarr` -> on-disk Zarr v3
store whose arrays READ BACK pixel-equal to the mosaic that was written,
whose metadata anchors the same geography, and which round-trips through
the INGESTION path (`zarr_tiles` re-cut equals the original level-0
tiles) — writer and reader are inverse maps, both distributed.
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.operators import tiling, zarr_sink
from data_model_spark.sources import zarr_store as Z
from data_model_spark.sources.images import generate_images_df

N_IMG = 12


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    store = str(tmp_path_factory.mktemp("sink") / "out.zarr")
    images = generate_images_df(spark, N_IMG)
    merged = tiling.merge_tiles(
        tiling.build_tiles(images, min_dimension=64, repartition=False)
    ).cache()
    manifest = zarr_sink.write_geozarr(merged, store).collect()
    yield store, merged, manifest
    merged.unpersist()


def test_manifest_covers_every_tile(written):
    store, merged, manifest = written
    assert len(manifest) == merged.count()
    assert all(r.n_bytes > 0 for r in manifest)


def test_store_metadata_shape(written):
    store, merged, _ = written
    nodes = Z.open_store(store)
    n_arrays = sum(1 for m in nodes.values() if m["node_type"] == "array")
    n_var_levels = merged.select("var", "level").distinct().count()
    assert n_arrays == n_var_levels
    # every band group carries the reference-shaped multiscales attribute
    for p, m in nodes.items():
        if m["node_type"] == "group" and p and "/" not in p:
            layout = m["attributes"]["multiscales"]["layout"]
            assert layout and all("scale" in e and "translation" in e for e in layout)


def test_readback_equals_written_mosaic(spark, written):
    """Pixels of every array == canvas mosaic of the merged tiles."""
    store, merged, _ = written
    nodes = Z.open_store(store)
    rows = merged.collect()
    by_vl = {}
    for r in rows:
        by_vl.setdefault((r.var, r.level), []).append(r)
    for (var, lv), tiles in by_vl.items():
        meta = nodes[f"{var}/{lv}"]
        got = Z.read_array(store, f"{var}/{lv}")
        tx0 = min(r.tile_x for r in tiles)
        ty1 = max(r.tile_y for r in tiles)
        want = np.zeros(meta["shape"], dtype=np.uint16)
        for r in tiles:
            canvas = decode_image(r.data, "raw-u16", 256, 256)
            oy = (ty1 - r.tile_y) * 256
            ox = (r.tile_x - tx0) * 256
            want[oy : oy + 256, ox : ox + 256] = canvas
        assert np.array_equal(got, want), (var, lv)


def test_roundtrip_through_ingestion_reader(spark, written):
    """zarr_tiles over the WRITTEN store re-cuts the same level-0 content:
    per-(var, tile) pixel sums equal the original merged tiles'."""
    store, merged, _ = written
    # the written arrays are per-level; re-cut only their level-0 arrays
    nodes = Z.open_store(store)
    lvl0 = [p for p, m in nodes.items()
            if m["node_type"] == "array" and p.endswith("/0")]
    frags = Z.zarr_tiles(spark, store, lvl0, min_dimension=256)
    got = {
        (r.var, r.tile_x, r.tile_y): r.s
        for r in frags.filter(F.col("level") == 0)
        .groupBy("var", "tile_x", "tile_y")
        .agg(F.sum("px_sum").alias("s"))
        .collect()
    }
    want = {
        (r.var, r.tile_x, r.tile_y): r.px_sum
        for r in merged.filter(F.col("level") == 0).collect()
    }
    # re-cut covers the full rectangular array extent, so it may emit
    # all-zero tiles where the original had none — those sum to 0
    for key, s in want.items():
        assert got.get(key, -1.0) == pytest.approx(s, abs=1e-6), key
    for key in set(got) - set(want):
        assert got[key] == 0.0, key


def test_rerun_is_idempotent(spark, written):
    store, merged, manifest = written
    again = zarr_sink.write_geozarr(merged, store).collect()
    assert sorted((r.var, r.level, r.cy, r.cx, r.crc32) for r in again) == sorted(
        (r.var, r.level, r.cy, r.cx, r.crc32) for r in manifest
    )
