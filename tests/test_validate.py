"""Metadata-document validation layer (reference store.py / common.py rules)."""

from data_model_spark.operators import validate as V
from data_model_spark.sources.tables import local_df

DDL = "store_id string, doc_type string, doc string"


def test_valid_docs_yield_no_issues(spark):
    docs = local_df(
        spark,
        [r for r in V.FIXTURE_DOCS if r[0] in ("s_ok_code", "s_ok_wkt", "s_pj_ok", "l_ok", "l_ok_nostd")],
        DDL,
    )
    assert V.validate_docs(docs).count() == 0


def test_each_failure_mode_detected_once(spark):
    got = {
        (r.store_id, r.code)
        for r in V.validate_docs(local_df(spark, V.FIXTURE_DOCS, DDL)).collect()
    }
    assert got == {
        ("s_bbox_missing", "BBOX_MISSING"),
        ("s_bbox_len", "BBOX_LEN"),
        ("s_bbox_order", "BBOX_ORDER_X"),
        ("s_bbox_order", "BBOX_ORDER_Y"),
        ("s_crs_missing", "CRS_MISSING"),
        ("s_crs_multi", "CRS_MULTIPLE"),
        ("s_code_fmt", "CRS_CODE_FORMAT"),
        ("l_shape_len", "SHAPE_LEN"),
        ("l_shape_missing", "SHAPE_LEN"),
        ("l_transform_len", "TRANSFORM_LEN"),
        ("l_cf_unknown", "CF_NAME_UNKNOWN"),
        ("l_cf_deprecated", "CF_NAME_UNKNOWN"),
        ("l_cf_invented", "CF_NAME_UNKNOWN"),
        ("s_pj_no_type", "PJ_TYPE_MISSING"),
        ("s_pj_bad_type", "PJ_TYPE_UNKNOWN"),
        ("s_pj_no_name", "PJ_NAME_MISSING"),
        ("s_pj_axis_missing", "PJ_AXIS_MISSING"),
        ("s_pj_axis_count", "PJ_AXIS_COUNT"),
        ("s_pj_incomplete", "PJ_PROJECTED_INCOMPLETE"),
        # datum / ellipsoid / axis-unit depth (VERDICT r3 item 4); the valid
        # twins (s_pj_datum_ok, s_pj_sphere_ok, s_pj_axis_unit_ok/_str,
        # l_ok_full_table, l_ok_snow) must NOT appear here
        ("s_pj_datum_bad_type", "PJ_DATUM_TYPE_UNKNOWN"),
        ("s_pj_datum_no_name", "PJ_DATUM_NAME_MISSING"),
        ("s_pj_ellipsoid_missing", "PJ_ELLIPSOID_MISSING"),
        ("s_pj_ellipsoid_shape", "PJ_ELLIPSOID_SHAPE"),
        ("s_pj_pm_no_lon", "PJ_PM_LONGITUDE_MISSING"),
        ("s_pj_axis_bad_dir", "PJ_AXIS_DIR_UNKNOWN"),
        ("s_pj_axis_unit_bad", "PJ_AXIS_UNIT_BAD"),
    }


def test_engine_layout_docs_validate_clean(spark):
    """The engine's own multiscale_layout output passes its own validator —
    the reference's 'models validate what the converter writes' loop."""
    import json

    from data_model_spark.functions import gridlib

    bounds = (600000.0, 5090000.0, 654900.0, 5144900.0)
    ovw = gridlib.overview_levels(5490, 5490, min_dimension=256)
    geoms = [
        gridlib.LevelGeom(
            asset=f"lv{d['level']}",
            width=d["width"],
            height=d["height"],
            resolution_m=10.0 * d["scale_relative"],
            derived_from=None,
        )
        for d in ovw
    ]
    layout = gridlib.multiscale_layout(geoms, bounds)
    rows = [("store0", "store", json.dumps({"spatial:bbox": list(bounds), "proj:code": "EPSG:32633"}))]
    rows += [
        (
            "store0",
            "level",
            json.dumps(
                {
                    "spatial:shape": d["spatial:shape"],
                    "spatial:transform": d["spatial:transform"],
                }
            ),
        )
        for d in layout.levels
    ]
    assert V.validate_docs(local_df(spark, rows, DDL)).count() == 0


class TestMalformedFieldTypes:
    """Non-array / non-numeric field VALUES (not just wrong lengths) must be
    flagged, mirroring DuckDB's json_array_length(non-array)=0 and TRY_CAST
    semantics on both engines."""

    def test_scalar_shape_and_string_bbox_flagged(self, spark):
        from data_model_spark.operators import validate as V
        from data_model_spark.sources.tables import local_df

        bad = [
            ("x1", "level", '{"spatial:shape": 5, "spatial:transform": [1,2,3,4,5,6]}'),
            ("x2", "store", '{"spatial:bbox": "oops", "proj:code": "EPSG:32632"}'),
            ("x3", "store", '{"spatial:bbox": ["a","b","c","d"], "proj:code": "EPSG:1"}'),
        ]
        docs = local_df(spark, bad, "store_id string, doc_type string, doc string")
        got = sorted((r.store_id, r.code) for r in V.validate_docs(docs).collect())
        assert ("x1", "SHAPE_LEN") in got
        assert ("x2", "BBOX_LEN") in got
        # x3: 4-element bbox of non-numeric strings -> order checks are NULL
        # (TRY_CAST both sides), no crash, no spurious ORDER issue
        assert not any(c.startswith("BBOX_ORDER") for _, c in got)


class TestProductDetectS1Depth:
    """S1 schema depth: the closed conditions TypedDict (reference
    s1.py:576-592) — a store whose polarization misses the GCP member must
    classify S1_partial, not S1 (VERDICT r3 item 5)."""

    def test_missing_gcp_is_partial(self, spark):
        from data_model_spark.operators import validate as V
        from data_model_spark.sources.tables import local_df

        paths = [("st", p) for p in V._s1_pol_paths("VV", skip=("gcp",))]
        df = local_df(spark, paths, "store_id string, path string")
        got = {(r.store_id, r.product) for r in V.product_detect_df(df).collect()}
        assert got == {("st", "S1_partial")}

    def test_full_conditions_is_s1(self, spark):
        from data_model_spark.operators import validate as V
        from data_model_spark.sources.tables import local_df

        paths = [("st", p) for p in V._s1_pol_paths("VV") + V._s1_pol_paths("VH")]
        df = local_df(spark, paths, "store_id string, path string")
        got = {(r.store_id, r.product) for r in V.product_detect_df(df).collect()}
        assert got == {("st", "S1")}
