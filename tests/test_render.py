"""WebMercator z/x/y tile render: NumPy goldens + bounds consistency.

Mirrors the reference's titiler consumer contract
(tests/test_titiler_integration.py:216-363): a 256x256 render over real
data, pixel-exact against an independent oracle that samples the raw
synthetic scenes (never the Spark tile pipeline), and cross-level /info
bounds agreeing within 2% of the extent.
"""

import numpy as np
import pytest

from data_model_spark.functions import crs as C
from data_model_spark.operators import render as R
from data_model_spark.operators.tiling import TILE_PX, build_tiles, merge_tiles
from data_model_spark.sources import images as img_src


def _scene_level_img(i: int, level: int) -> tuple[np.ndarray, float, float]:
    """(level image, anchor_x, top_y) of scene i — independent re-derivation:
    codec-roundtripped pixels (what the pipeline actually ingests; lossy
    fmts included) + exact /2 block-sum cascade (u16 sums exact in int64),
    the same arithmetic contract as the engine but from first principles."""
    from data_model_spark.codecs import decode_image, encode_image

    w, h = img_src.image_dims(i)
    image_id = f"img_{i:012d}"
    fmt = img_src.image_fmt(i)
    raw = img_src.synth_pixels(image_id, w, h)
    arr = decode_image(encode_image(raw, fmt), fmt, w, h).astype(np.int64)
    for _ in range(level):
        h2, w2 = arr.shape[0] // 2, arr.shape[1] // 2
        arr = arr[: 2 * h2, : 2 * w2].reshape(h2, 2, w2, 2).sum(axis=(1, 3))
    out = (arr / 4.0**level).astype(np.uint16)
    ax, ay = img_src.scene_anchor(i)
    return out, ax, ay + h * img_src.PIXEL_SIZE_M


def _oracle_render(z: int, x: int, y: int, level: int, var: str = "b01") -> np.ndarray:
    """Render the target tile straight from the synthetic scenes."""
    px = img_src.PIXEL_SIZE_M * (2**level)
    ux, uy = R._target_pixel_utm(z, x, y, img_src.SCENE_EPSG)
    out = np.zeros((TILE_PX, TILE_PX), dtype=np.uint16)
    scenes = [i for i in range(48) if img_src.band_for(i) == var]
    for i in sorted(scenes, key=lambda i: f"img_{i:012d}"):  # compose order
        w, h = img_src.image_dims(i)
        lw, lh = w >> level, h >> level
        if min(lw, lh) < 64:  # below min_dimension: level not built
            continue
        img, ax, top = _scene_level_img(i, level)
        col = np.floor((ux - ax) / px).astype(np.int64)
        row = np.floor((top - uy) / px).astype(np.int64)
        m = (col >= 0) & (col < lw) & (row >= 0) & (row < lh)
        out[m] = img[row[m], col[m]]
    return out


@pytest.fixture(scope="module")
def merged(spark):
    m = merge_tiles(
        build_tiles(img_src.generate_images_df(spark, 48), 64, repartition=False)
    ).persist()
    m.count()
    return m


class TestRenderGolden:
    def _target(self, z):
        ax, ay = img_src.scene_anchor(16)
        lon, lat = C.transform_points(
            np.array([ax + 1280.0]), np.array([ay + 2560.0]),
            img_src.SCENE_EPSG, 4326,
        )
        return R.mercator_tile_for(float(lon[0]), float(lat[0]), z)

    @pytest.mark.parametrize("z,exp_level", [(13, 0), (12, 1)])
    def test_render_matches_numpy_oracle(self, spark, merged, z, exp_level):
        tx, ty = self._target(z)
        got = R.render_tiles(merged, z, [(tx, ty)], var="b01").collect()
        assert len(got) == 1
        r = got[0]
        assert r.src_level == exp_level
        canvas = np.frombuffer(r.data, dtype=np.uint16).reshape(TILE_PX, TILE_PX)
        oracle = _oracle_render(z, tx, ty, exp_level)
        assert (canvas == oracle).all(), (
            f"{(canvas != oracle).sum()} differing pixels at z={z}"
        )
        assert r.filled_px == int((oracle > 0).sum()) and r.filled_px > 1000

    def test_empty_region_renders_zero(self, spark, merged):
        # a tile far outside the mosaic: fetch is empty -> no output row
        got = R.render_tiles(merged, 13, [(0, 0)], var="b01").collect()
        assert got == []


class TestSourceLevelChoice:
    def test_zoom_to_level_monotone(self):
        y = 2915  # ~lat 46N
        lv = [R.pick_source_level(z, y * (1 << (z - 13)) if z >= 13 else y >> (13 - z),
                                  10.0, 8) for z in (14, 13, 12, 11)]
        assert lv == [0, 0, 1, 2]

    def test_clamped_to_pyramid(self):
        assert R.pick_source_level(5, 10, 10.0, 2) == 2
        assert R.pick_source_level(20, 2915 << 7, 10.0, 2) == 0


class TestMercatorMath:
    def test_roundtrip(self):
        lon = np.array([-179.0, -10.5, 0.0, 10.26, 179.0])
        lat = np.array([-80.0, -45.0, 0.0, 45.94, 80.0])
        x, y = C.lonlat_to_webmercator(lon, lat)
        lon2, lat2 = C.webmercator_to_lonlat(x, y)
        assert np.allclose(lon, lon2, atol=1e-9) and np.allclose(lat, lat2, atol=1e-9)

    def test_tile_bounds_partition_world(self):
        l0 = R.mercator_tile_bounds(1, 0, 0)
        r0 = R.mercator_tile_bounds(1, 1, 0)
        assert l0[2] == r0[0] == 0.0
        assert l0[3] == C.WEBMERCATOR_ORIGIN and l0[1] == 0.0


class TestBoundsConsistency:
    def test_cross_level_drift_under_2pct(self, spark):
        """Reference contract: per-level /info bounds within 2% of the
        extent (test_titiler_integration.py:309-363).  Scene 16 builds a
        clean 3-level pyramid; exact fragment extents must agree to ~0."""
        frags = build_tiles(
            img_src.generate_images_df(spark, 48), 64, repartition=False
        ).filter("image_id = 'img_000000000016'")
        bounds = R.level_bounds_lonlat(frags)
        assert len(bounds) == 3
        ref = bounds[0]["bounds"]
        extent = max(abs(ref[2] - ref[0]), abs(ref[3] - ref[1]))
        tol = extent * 0.02
        for b in bounds[1:]:
            for i in range(4):
                assert abs(b["bounds"][i] - ref[i]) < tol
