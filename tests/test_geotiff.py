"""GeoTIFF codec: structure, round trips, on-disk e2e, engine parity."""

import struct
import zlib

import numpy as np

from data_model_spark.codecs.geotiff import TILE, decode_geotiff, encode_geotiff
from data_model_spark.operators.geotiff_io import (
    N_SCENES,
    geotiff_rt_fp,
    scene_geotiff_row,
)
from data_model_spark.sources import images as img_src


def test_roundtrip_shapes_and_compressions():
    rng = np.random.default_rng(7)
    for shape in ((256, 256), (300, 500), (64, 100), (513, 257)):
        a = rng.integers(0, 65536, shape).astype(np.uint16)
        for comp in (True, False):
            b = encode_geotiff(a, (600000.0, 5090000.0), 10.0, 32632, comp)
            arr, origin, px, epsg = decode_geotiff(b)
            assert np.array_equal(arr, a)
            assert origin == (600000.0, 5090000.0)
            assert (px, epsg) == (10.0, 32632)


def test_tiff_structure():
    a = np.arange(256 * 256, dtype=np.uint16).reshape(256, 256)
    b = encode_geotiff(a, (0.0, 0.0), 10.0, 32632)
    assert b[:4] == b"II*\x00"  # little-endian classic magic
    (ifd_off,) = struct.unpack_from("<I", b, 4)
    (n,) = struct.unpack_from("<H", b, ifd_off)
    tags = [struct.unpack_from("<H", b, ifd_off + 2 + 12 * i)[0] for i in range(n)]
    assert tags == sorted(tags)  # spec: ascending tag order
    for required in (256, 257, 258, 259, 322, 323, 324, 325, 33550, 33922, 34735):
        assert required in tags, required


def test_edge_tiles_padded():
    # 300x500: edge tiles pad to 256x256; padding decodes away exactly
    a = np.full((300, 500), 7, np.uint16)
    b = encode_geotiff(a, (0.0, 0.0), 1.0, 32601, compress=False)
    arr, _, _, _ = decode_geotiff(b)
    assert arr.shape == (300, 500) and (arr == 7).all()
    # raw layout: ceil(300/256)*ceil(500/256) = 2*2 full tiles
    assert b.count(struct.pack("<H", TILE)) >= 2


def test_on_disk_e2e(tmp_path):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 65536, (300, 260)).astype(np.uint16)
    p = tmp_path / "scene.tif"
    p.write_bytes(encode_geotiff(a, (600000.0, 5091000.0), 10.0, 32632))
    arr, origin, px, epsg = decode_geotiff(p.read_bytes())
    assert np.array_equal(arr, a)
    assert origin == (600000.0, 5091000.0) and epsg == 32632


def test_reject_garbage():
    import pytest

    with pytest.raises(ValueError):
        decode_geotiff(b"MM\x00*not-a-le-tiff")


def test_engine_matches_replay(spark):
    got = {
        r.image_id: (r.tif_len, r.tif_crc, r.px_crc, r.ox_mm, r.oy_mm, r.ok)
        for r in geotiff_rt_fp(spark, "").collect()
    }
    assert len(got) == N_SCENES
    for i in range(0, N_SCENES, 17):  # spot replay (full set is the oracle)
        image_id = f"img_{i:012d}"
        w, h = img_src.image_dims(i)
        assert got[image_id] == scene_geotiff_row(image_id, w, h)
    assert all(v[5] for v in got.values())  # every round trip validated


def test_cog_levels_and_layout():
    from data_model_spark.codecs.geotiff import (
        decode_cog,
        downsample2x_u16,
        encode_cog,
    )

    rng = np.random.default_rng(11)
    a = rng.integers(0, 65536, (1100, 700)).astype(np.uint16)
    blob = encode_cog(a, (600000.0, 5090000.0), 10.0, 32632)
    levels, geo = decode_cog(blob)
    assert [lv.shape for lv, _ in levels] == [(1100, 700), (550, 350)]
    assert [ov for _, ov in levels] == [False, True]
    assert np.array_equal(levels[0][0], a)
    assert np.array_equal(levels[1][0], downsample2x_u16(a))
    assert geo == ((600000.0, 5090000.0), 10.0, 32632)
    # COG layout: IFD0's chain pointer is in the header region, and the
    # OVERVIEW tile data precedes the full-res data in the file
    import struct as _s

    (ifd0,) = _s.unpack_from("<I", blob, 4)
    assert ifd0 == 8  # IFDs at the very front


def test_cog_downsample_halfup():
    from data_model_spark.codecs.geotiff import downsample2x_u16

    a = np.array([[1, 2], [2, 2]], np.uint16)  # mean 1.75 -> 2 (HALF UP)
    assert downsample2x_u16(a)[0, 0] == 2
    b = np.array([[1, 1], [1, 2]], np.uint16)  # mean 1.25 -> 1
    assert downsample2x_u16(b)[0, 0] == 1
    c = np.array([[1, 1], [2, 2]], np.uint16)  # mean 1.5 -> 2
    assert downsample2x_u16(c)[0, 0] == 2


def test_cog_engine_matches_replay(spark):
    from data_model_spark.operators.geotiff_io import cog_rt_fp, scene_cog_row

    got = {
        r.image_id: (r.cog_len, r.cog_crc, r.n_levels, r.ov_crc, r.ok)
        for r in cog_rt_fp(spark, "").collect()
    }
    assert len(got) == N_SCENES
    for i in range(0, N_SCENES, 23):
        image_id = f"img_{i:012d}"
        w, h = img_src.image_dims(i)
        assert got[image_id] == scene_cog_row(image_id, w, h)
    assert all(v[4] for v in got.values())
    assert any(v[2] >= 2 for v in got.values())  # overviews actually exist
