"""Golden tests for the deterministic planning kernels (no Spark).

Goldens mirror the reference's unit tests (FIXTURES.md §4):
``tests/test_conversion.py:59-79`` (aligned chunks),
``tests/test_conversion.py:126-145`` (overview levels),
``tests/test_s2_multiscale.py:101-124`` (shard dims).
"""

import math

import numpy as np
import pytest

from data_model_spark.functions import cells, crs, geometry, gridlib


class TestAlignedChunks:
    def test_perfect_divisor(self):
        assert gridlib.aligned_chunk_size(1000, 256) == 250
        assert 1000 % 250 == 0

    def test_larger_than_dim(self):
        assert gridlib.aligned_chunk_size(100, 256) == 100

    def test_no_divisor_prime(self):
        assert gridlib.aligned_chunk_size(97, 50) == 50

    def test_s2_native(self):
        assert gridlib.aligned_chunk_size(5490, 3660) == 2745

    def test_exact(self):
        assert gridlib.aligned_chunk_size(1024, 256) == 256


class TestShardDims:
    def test_chunk_covers_dim(self):
        assert gridlib.shard_dimension(100, 256) == 100

    def test_multiple(self):
        # 1000/250 = 4 complete chunks -> multiplier from 5..3: 5*250>1000, 4*250=1000
        assert gridlib.shard_dimension(1000, 250) == 1000

    def test_partial(self):
        # 1100/250 = 4 complete -> 4*250=1000 <= 1100
        assert gridlib.shard_dimension(1100, 250) == 1000

    def test_single_chunk(self):
        assert gridlib.shard_dimension(300, 250) == 250


class TestOverviewLevels:
    def test_1024_golden(self):
        levels = gridlib.overview_levels(1024, 1024, min_dimension=256)
        assert [lv["level"] for lv in levels] == [0, 1, 2]
        assert [lv["width"] for lv in levels] == [1024, 512, 256]
        assert [lv["height"] for lv in levels] == [1024, 512, 256]
        assert [lv["scale_relative"] for lv in levels] == [1, 2, 4]

    def test_small_input_native_only(self):
        levels = gridlib.overview_levels(300, 300, min_dimension=256)
        assert len(levels) == 1

    def test_non_square(self):
        levels = gridlib.overview_levels(549, 549, min_dimension=128)
        # 549 -> 274 -> 137 -> stop (next is 68 < 128)
        assert [lv["width"] for lv in levels] == [549, 274, 137]


class TestZoomAffine:
    def test_zoom(self):
        assert gridlib.zoom_level(256, 256) == 0
        assert gridlib.zoom_level(512, 256) == 1
        assert gridlib.zoom_level(549, 549) == 2  # ceil(log2(549/256)) = 2
        assert gridlib.zoom_level(10980, 10980) == 6

    def test_affine_from_bounds(self):
        t = gridlib.affine_from_bounds(600000, 5090000, 605490, 5095490, 549, 549)
        assert t[0] == pytest.approx(10.0)
        assert t[4] == pytest.approx(-10.0)
        assert t[2] == 600000 and t[5] == 5095490

    def test_transform_from_coords_matches_bounds(self):
        xs, ys = gridlib.coords_from_bounds(600000, 5090000, 605490, 5095490, 549, 549)
        tc = gridlib.transform_from_coordinates(xs, ys)
        tb = gridlib.affine_from_bounds(600000, 5090000, 605490, 5095490, 549, 549)
        # coords are edge-anchored: x_min == left, y_max == top
        assert tc[0] == pytest.approx(tb[0])
        assert tc[2] == pytest.approx(tb[2])
        assert gridlib.transforms_close(tc, (10.0, 0.0, 600000.0, 0.0, -10.0, 5095490.0))

    def test_preferred_transform_prefers_matching_metadata(self):
        coord_t = (10.0, 0.0, 600000.0, 0.0, -10.0, 5095490.0)
        meta_t = (10.0 + 1e-12, 0.0, 600000.0, 0.0, -10.0, 5095490.0)
        assert gridlib.preferred_spatial_transform(coord_t, meta_t) == meta_t
        bad_meta = (20.0, 0.0, 600000.0, 0.0, -20.0, 5095490.0)
        assert gridlib.preferred_spatial_transform(coord_t, bad_meta) == coord_t
        assert gridlib.preferred_spatial_transform(None, bad_meta) == bad_meta

    def test_point_to_pixel_roundtrip(self):
        t = gridlib.affine_from_bounds(0, 0, 100, 100, 10, 10)
        col, row = gridlib.point_to_pixel(t, np.array([5.0, 95.0]), np.array([95.0, 5.0]))
        assert list(col) == [0, 9]
        assert list(row) == [0, 9]


class TestCfCodecNodata:
    def test_roundtrip(self):
        vals = np.array([0.0, 0.5, 1.0, np.nan])
        packed = gridlib.cf_encode(vals, 1e-4, 0.0, fill_sentinel=0)
        assert packed[1] == 5000
        decoded = gridlib.cf_decode(packed[:3], 1e-4, 0.0)
        np.testing.assert_allclose(decoded, vals[:3], atol=1e-9)

    def test_nodata_defaults(self):
        assert gridlib.default_nodata(np.uint8) == 255
        assert gridlib.default_nodata(np.uint16) == 65535
        assert gridlib.default_nodata(np.int16) == -32768
        assert gridlib.default_nodata(np.int32) == 0
        assert math.isnan(gridlib.default_nodata(np.float32))

    def test_canonicalize_json(self):
        obj = {"a": float("nan"), "b": [1.0, float("inf"), float("-inf")], "c": "x"}
        out = gridlib.canonicalize_json_floats(obj)
        assert out == {"a": "NaN", "b": [1.0, "Infinity", "-Infinity"], "c": "x"}

    def test_sanitize_attrs(self):
        attrs = {
            "_eopf_attrs": {"x": 1},
            "_FillValue": 0,
            "dtype": "uint16",
            "units": "digital_counts",
            "keep": 1,
        }
        out = gridlib.sanitize_array_attrs(attrs, is_decoded_float=True)
        assert out == {"units": "1", "keep": 1}
        out2 = gridlib.sanitize_array_attrs(attrs, is_decoded_float=False)
        assert out2 == {"dtype": "uint16", "units": "digital_counts", "keep": 1}


class TestCoordAttrTemplates:
    """Goldens: the exact attr dicts of reference conversion/geozarr.py
    _get_{x,y,lon,lat}_coord_attrs (1540-1577) and _add_coordinate_metadata
    (1265-1337)."""

    def test_projected_xy(self):
        for epsg in (32632, 3857, None):
            assert gridlib.coord_attr_template("x", epsg) == {
                "_ARRAY_DIMENSIONS": ["x"],
                "standard_name": "projection_x_coordinate",
                "units": "m",
                "long_name": "x coordinate of projection",
            }
            assert gridlib.coord_attr_template("y", epsg) == {
                "_ARRAY_DIMENSIONS": ["y"],
                "standard_name": "projection_y_coordinate",
                "units": "m",
                "long_name": "y coordinate of projection",
            }

    def test_geographic_xy(self):
        assert gridlib.coord_attr_template("x", 4326) == {
            "_ARRAY_DIMENSIONS": ["x"],
            "standard_name": "longitude",
            "units": "degrees_east",
            "long_name": "longitude",
        }
        assert gridlib.coord_attr_template("y", 4326) == {
            "_ARRAY_DIMENSIONS": ["y"],
            "standard_name": "latitude",
            "units": "degrees_north",
            "long_name": "latitude",
        }

    def test_crs_independent_coords(self):
        assert gridlib.coord_attr_template("time", 4326) == {
            "_ARRAY_DIMENSIONS": ["time"],
            "standard_name": "time",
        }
        assert gridlib.coord_attr_template("band", 32632) == {
            "_ARRAY_DIMENSIONS": ["band"],
            "standard_name": "band",
            "long_name": "spectral band identifier",
        }
        assert gridlib.coord_attr_template("detector", 32632)["long_name"] == (
            "detector identifier"
        )
        assert gridlib.coord_attr_template("angle", 3857)["long_name"] == (
            "angle coordinate"
        )

    def test_unknown_coord_gets_dims_only(self):
        assert gridlib.coord_attr_template("scene", 32632) == {
            "_ARRAY_DIMENSIONS": ["scene"]
        }


class TestMultiscaleLayout:
    def test_layout_fields_and_dynamic_scale(self):
        levels = [
            gridlib.LevelGeom("r10m", 549, 549, 10),
            gridlib.LevelGeom("r20m", 275, 275, 20, derived_from="r10m"),
            gridlib.LevelGeom("r60m", 92, 92, 60, derived_from="r10m"),
        ]
        layout = gridlib.multiscale_layout(levels, (600000, 5090000, 605490, 5095490))
        entries = {e["asset"]: e for e in layout.levels}
        assert entries["r10m"]["transform"]["scale"] == 1.0
        # dynamic ratio: 549/275 = 1.9964 (not the nominal 2.0)
        assert entries["r20m"]["transform"]["scale"] == pytest.approx(549 / 275)
        assert entries["r60m"]["transform"]["scale"] == pytest.approx(549 / 92)
        for e in layout.levels:
            assert e["transform"]["translation"] == 0.0
            assert len(e["spatial:transform"]) == 6
        assert entries["r10m"]["spatial:shape"] == [549, 549]
        assert entries["r10m"]["zoom"] == 2


class TestCrs:
    def test_parse_epsg(self):
        assert crs.parse_epsg("EPSG:32632") == 32632
        assert crs.parse_epsg(32632) == 32632
        assert crs.parse_epsg("4326") == 4326
        assert crs.epsg_to_utm_zone(32632) == (32, True)
        assert crs.epsg_to_utm_zone(32732) == (32, False)
        assert crs.utm_epsg(32, True) == 32632

    def test_central_meridian_anchor(self):
        # on the central meridian at the equator: x == 500000, y == 0
        x, y = crs.lonlat_to_utm(9.0, 0.0, zone=32)
        assert float(x) == pytest.approx(500000.0, abs=1e-6)
        assert float(y) == pytest.approx(0.0, abs=1e-6)

    def test_roundtrip_zone32(self):
        rng = np.random.default_rng(42)
        lon = 9.0 + rng.uniform(-2.5, 2.5, 200)
        lat = rng.uniform(-75, 75, 200)
        x, y = crs.lonlat_to_utm(lon, lat, zone=32)
        lon2, lat2 = crs.utm_to_lonlat(x, y, zone=32)
        np.testing.assert_allclose(lon2, lon, atol=1e-8)
        np.testing.assert_allclose(lat2, lat, atol=1e-8)

    def test_south_hemisphere(self):
        x, y = crs.lonlat_to_utm(9.0, -30.0, zone=32, north=False)
        assert float(y) > 6_000_000  # false northing applied
        lon2, lat2 = crs.utm_to_lonlat(x, y, zone=32, north=False)
        assert float(lat2) == pytest.approx(-30.0, abs=1e-8)

    def test_known_point_scene_anchor(self):
        # the FIXTURES scene anchor (600000, 5090000) in EPSG:32632 must land
        # near lon ~10.3, lat ~45.9 (zone 32, ~100km east of central meridian)
        lon, lat = crs.utm_to_lonlat(600000.0, 5090000.0, zone=32)
        assert 10.0 < float(lon) < 10.6
        assert 45.5 < float(lat) < 46.2
        # scale distortion at 100 km offset is ~1.0: 10 m steps stay ~10 m
        lon2, lat2 = crs.utm_to_lonlat(600010.0, 5090000.0, zone=32)
        dist = crs.haversine_m(lon, lat, lon2, lat2)
        assert float(dist) == pytest.approx(10.0, rel=0.01)

    def test_transform_points_dispatch(self):
        x, y = crs.transform_points(np.array([10.0]), np.array([46.0]), 4326, 32632)
        lon, lat = crs.transform_points(x, y, 32632, 4326)
        assert float(lon[0]) == pytest.approx(10.0, abs=1e-8)
        assert float(lat[0]) == pytest.approx(46.0, abs=1e-8)


class TestCells:
    def test_pack_unpack(self):
        c = cells.cell_of(np.array([10.0]), np.array([46.0]), 12)
        assert cells.cell_res(c)[0] == 12
        lo_x, lo_y, hi_x, hi_y = cells.cell_bounds(c)
        assert lo_x[0] <= 10.0 < hi_x[0]
        assert lo_y[0] <= 46.0 < hi_y[0]

    def test_parent_contains(self):
        c = cells.cell_of(10.0, 46.0, 12)
        p = cells.parent(c, 3)
        assert cells.cell_res(p) == 9
        assert p == cells.cell_of(10.0, 46.0, 9)

    def test_children_partition_parent(self):
        c = int(cells.cell_of(10.0, 46.0, 8))
        kids = cells.children(c)
        assert len(kids) == 4
        assert all(int(cells.parent(k)) == c for k in kids)

    def test_k_ring_counts(self):
        c = int(cells.cell_of(10.0, 46.0, 10))
        assert len(cells.k_ring(c, 0)) == 1
        assert len(cells.k_ring(c, 1)) == 9
        assert len(cells.k_ring(c, 2)) == 25

    def test_k_ring_lat_clamp(self):
        c = int(cells.cell_of(0.0, 89.99, 6))  # top row
        ring = cells.k_ring(c, 1)
        assert len(ring) == 6  # top row clipped

    def test_k_ring_many_matches_scalar(self):
        cs = cells.cell_of(np.array([10.0, -170.0]), np.array([46.0, -80.0]), 9)
        src, ring = cells.k_ring_many(cs, 1)
        for i, c in enumerate(cs):
            got = np.unique(ring[src == i])
            np.testing.assert_array_equal(got, cells.k_ring(int(c), 1))

    def test_polygon_cover_superset_and_exact(self):
        poly = np.array([[10.0, 46.0], [10.4, 46.0], [10.4, 46.3], [10.0, 46.3]])
        cover = cells.polygon_cover(poly, 10)
        # every point sampled inside the polygon must fall in a cover cell
        rng = np.random.default_rng(1)
        px = rng.uniform(10.0, 10.4, 100)
        py = rng.uniform(46.0, 46.3, 100)
        pc = cells.cell_of(px, py, 10)
        assert np.isin(pc, cover).all()
        # exact cover is a subset of bbox cover
        bbox_c = cells.polygon_cover(poly, 10, exact=False)
        assert np.isin(cover, bbox_c).all()

    def test_exact_cover_prunes_triangle(self):
        # thin triangle: bbox cover includes cells the triangle misses
        poly = np.array([[0.0, 0.0], [2.0, 0.0], [0.0, 2.0]])
        exact = cells.polygon_cover(poly, 9)
        bbox_c = cells.polygon_cover(poly, 9, exact=False)
        assert len(exact) < len(bbox_c)


class TestGeometry:
    def test_pip_square(self):
        poly = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        px = np.array([5.0, 15.0, -1.0, 9.999])
        py = np.array([5.0, 5.0, 5.0, 9.999])
        np.testing.assert_array_equal(
            geometry.points_in_polygon(px, py, poly), [True, False, False, True]
        )

    def test_pip_concave(self):
        # L-shape
        poly = np.array([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]], dtype=float)
        px = np.array([1.0, 3.0, 3.0, 1.0])
        py = np.array([1.0, 1.0, 3.0, 3.0])
        np.testing.assert_array_equal(
            geometry.points_in_polygon(px, py, poly), [True, True, False, True]
        )

    def test_pip_matches_matplotlib_free_oracle(self):
        # brute-force winding-number oracle on random points
        rng = np.random.default_rng(7)
        poly = np.array([[0, 0], [5, 1], [6, 4], [3, 6], [-1, 3]], dtype=float)
        px = rng.uniform(-2, 7, 500)
        py = rng.uniform(-1, 7, 500)
        got = geometry.points_in_polygon(px, py, poly)

        def winding(x, y):
            wn = 0
            n = len(poly)
            for i in range(n):
                x1, y1 = poly[i]
                x2, y2 = poly[(i + 1) % n]
                if y1 <= y:
                    if y2 > y and (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1) > 0:
                        wn += 1
                elif y2 <= y and (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1) < 0:
                    wn -= 1
            return wn != 0

        expected = np.array([winding(x, y) for x, y in zip(px, py)])
        np.testing.assert_array_equal(got, expected)

    def test_rect_polygon_intersect(self):
        poly = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
        lo_x = np.array([2.0, 20.0, -5.0, -5.0])
        lo_y = np.array([2.0, 20.0, -5.0, 4.0])
        hi_x = np.array([3.0, 25.0, 15.0, 15.0])
        hi_y = np.array([3.0, 25.0, 15.0, 6.0])
        # inside; far away; rect contains polygon; rect straddles horizontally
        np.testing.assert_array_equal(
            geometry.rects_intersect_polygon(lo_x, lo_y, hi_x, hi_y, poly),
            [True, False, True, True],
        )

    def test_bbox_union_and_area(self):
        b = np.array([[0, 0, 2, 2], [1, -1, 3, 1]], dtype=float)
        assert geometry.bbox_union(b) == (0.0, -1.0, 3.0, 2.0)
        tri = np.array([[0, 0], [4, 0], [0, 3]], dtype=float)
        assert geometry.polygon_area(tri) == pytest.approx(6.0)
