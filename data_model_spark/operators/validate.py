"""Metadata-document validation layer (SURVEY §2 S7/P7 document twin).

The reference validates GeoZarr store/layout documents with pydantic models:
store-root attrs need a 4-float ordered ``spatial:bbox`` and EXACTLY ONE of
``proj:code`` / ``proj:wkt2`` / ``proj:projjson``
(`data_api/geozarr/store.py:30-129`), multiscale layout entries need a
2-int ``spatial:shape`` + 6-float ``spatial:transform``
(`store.py:78-100`), and CF standard names must come from the published
table (`data_api/geozarr/common.py:107-169`; fetched from the CF URL there,
embedded as a static subset here — no network in this engine).

Spark-first re-expression: documents are ROWS of a table
``(store_id, doc_type, doc:json-string)``; every rule is a JVM-side JSON
expression (``get_json_object`` / ``json_array_length`` / ``rlike`` — no
Python UDFs), each producing zero or one issue row, stacked with a single
``explode(array(...)) + filter`` — one narrow scan, no shuffle until the
final ordering.  At 10^12 documents this validates embarrassingly
parallel, one pass over the metadata table.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.tables import local_df
from .registry import register

# CF standard-name validation: vendored snapshot of the published table
# (functions/cf_names.py) instead of the reference's import-time HTTP fetch
# (common.py:107-167) — deterministic on air-gapped clusters, never silently
# disabled.  The FULL table plugs in via a local file (DMS_CF_TABLE_PATH,
# union semantics) or cf_names.fetch_cf_standard_names() online refresh;
# read once per process so the Spark rules and the DuckDB oracle always
# agree on the same set.
from ..functions.cf_names import effective_cf_names

CF_NAMES = effective_cf_names()

# PROJJSON CRS document structure (reference data_api/geozarr/projjson.py —
# pydantic models of the OGC PROJJSON schema).  The structural rules below
# cover the load-bearing subset: a known CRS `type`, a `name`, a coordinate
# system whose `axis` list has 1..3 entries, and ProjectedCRS completeness
# (`base_crs` + `conversion` are required fields, projjson.py:369-374).
PROJJSON_CRS_TYPES = (
    "GeodeticCRS",
    "GeographicCRS",
    "ProjectedCRS",
    "VerticalCRS",
    "TemporalCRS",
    "ParametricCRS",
    "EngineeringCRS",
    "CompoundCRS",
    "BoundCRS",
    "DerivedGeodeticCRS",
    "DerivedGeographicCRS",
    "DerivedProjectedCRS",
)

#: known datum `type` discriminators (projjson.py:171-287 model literals)
PROJJSON_DATUM_TYPES = (
    "GeodeticReferenceFrame",
    "DynamicGeodeticReferenceFrame",
    "VerticalReferenceFrame",
    "DynamicVerticalReferenceFrame",
    "TemporalDatum",
    "ParametricDatum",
    "EngineeringDatum",
    "DatumEnsemble",
)

#: geodetic frames REQUIRE an ellipsoid (projjson.py:176, 194)
_GEODETIC_DATUM_TYPES = (
    "GeodeticReferenceFrame",
    "DynamicGeodeticReferenceFrame",
)

#: Axis.direction literal enumeration (projjson.py:81-123, OGC schema)
PROJJSON_AXIS_DIRECTIONS = (
    "north", "northNorthEast", "northEast", "eastNorthEast",
    "east", "eastSouthEast", "southEast", "southSouthEast",
    "south", "southSouthWest", "southWest", "westSouthWest",
    "west", "westNorthWest", "northWest", "northNorthWest",
    "up", "down",
    "geocentricX", "geocentricY", "geocentricZ",
    "columnPositive", "columnNegative", "rowPositive", "rowNegative",
    "displayRight", "displayLeft", "displayUp", "displayDown",
    "forward", "aft", "port", "starboard",
    "clockwise", "counterClockwise", "towards", "awayFrom",
    "future", "past", "unspecified",
)

#: Unit.type literal enumeration (projjson.py:23-25)
PROJJSON_UNIT_TYPES = (
    "Unit", "AngularUnit", "LinearUnit", "ScaleUnit",
    "ParametricUnit", "TimeUnit",
)


def _issue(cond, code: str):
    return F.when(cond, F.lit(code))


def validate_docs(docs: DataFrame) -> DataFrame:
    """Issue table (store_id, doc_type, code) for a document table.

    ``doc_type='store'`` rows get the store-root rules, ``'level'`` rows the
    multiscale-layout-entry rules.  Valid documents yield no rows.
    """
    g = lambda p: F.get_json_object("doc", p)  # noqa: E731
    bbox = g("$['spatial:bbox']")
    # try_cast: a non-numeric bbox element must surface as a rule miss,
    # not abort the whole scan (ANSI cast throws; DuckDB twin uses TRY_CAST)
    bb = [g(f"$['spatial:bbox'][{i}]").try_cast("double") for i in range(4)]
    n_crs = (
        g("$['proj:code']").isNotNull().cast("int")
        + g("$['proj:wkt2']").isNotNull().cast("int")
        + g("$['proj:projjson']").isNotNull().cast("int")
    )
    shape = g("$['spatial:shape']")
    transform = g("$['spatial:transform']")

    def _arr_len(col):
        # mirror DuckDB: json_array_length(non-array) = 0 (Spark returns
        # NULL, which made every length rule silently pass for scalar or
        # string values in the field); missing field stays NULL
        return F.when(col.isNotNull(), F.coalesce(F.json_array_length(col), F.lit(0)))

    std_name = g("$['standard_name']")
    is_store = F.col("doc_type") == "store"
    is_level = F.col("doc_type") == "level"

    # PROJJSON structural rules (reference projjson.py pydantic models);
    # all nested JSON access stays a JVM expression
    pj = g("$['proj:projjson']")
    pj_type = g("$['proj:projjson'].type")
    pj_name = g("$['proj:projjson'].name")
    pj_cs = g("$['proj:projjson'].coordinate_system")
    pj_axis = g("$['proj:projjson'].coordinate_system.axis")
    pj_axis_n = _arr_len(pj_axis)
    has_pj = is_store & pj.isNotNull()

    # datum / ellipsoid / prime-meridian subtrees (projjson.py:152-305)
    datum = g("$['proj:projjson'].datum")
    datum_type = g("$['proj:projjson'].datum.type")
    datum_name = g("$['proj:projjson'].datum.name")
    ell = g("$['proj:projjson'].datum.ellipsoid")
    ell_name = g("$['proj:projjson'].datum.ellipsoid.name")
    ell_smaj = g("$['proj:projjson'].datum.ellipsoid.semi_major_axis")
    ell_smin = g("$['proj:projjson'].datum.ellipsoid.semi_minor_axis")
    ell_invf = g("$['proj:projjson'].datum.ellipsoid.inverse_flattening")
    ell_radius = g("$['proj:projjson'].datum.ellipsoid.radius")
    pm = g("$['proj:projjson'].datum.prime_meridian")
    pm_lon = g("$['proj:projjson'].datum.prime_meridian.longitude")
    has_datum = has_pj & datum.isNotNull()
    has_ell = has_datum & ell.isNotNull()

    def _is_obj(col):
        return F.substring(col, 1, 1) == "{"

    # per-axis direction / unit rules: the axis-count rule bounds the list
    # to 1..3 entries, so indexed access over [0..2] is complete coverage
    _ax = "$['proj:projjson'].coordinate_system.axis"
    axis_dir_bad = F.lit(False)
    axis_unit_bad = F.lit(False)
    for i in range(3):
        a_i = g(f"{_ax}[{i}]")
        d_i = g(f"{_ax}[{i}].direction")
        u_i = g(f"{_ax}[{i}].unit")
        un_i = g(f"{_ax}[{i}].unit.name")
        uc_i = g(f"{_ax}[{i}].unit.conversion_factor")
        ut_i = g(f"{_ax}[{i}].unit.type")
        axis_dir_bad = axis_dir_bad | (
            a_i.isNotNull()
            & (d_i.isNull() | ~d_i.isin(*PROJJSON_AXIS_DIRECTIONS))
        )
        # a unit may be a plain string ("metre") or a Unit object; only the
        # object form carries name/conversion_factor/type requirements
        axis_unit_bad = axis_unit_bad | (
            a_i.isNotNull()
            & u_i.isNotNull()
            & _is_obj(u_i)
            & (
                un_i.isNull()
                | uc_i.isNull()
                | (ut_i.isNotNull() & ~ut_i.isin(*PROJJSON_UNIT_TYPES))
            )
        )

    checks = [
        _issue(is_store & bbox.isNull(), "BBOX_MISSING"),
        _issue(
            is_store & bbox.isNotNull() & (_arr_len(bbox) != 4),
            "BBOX_LEN",
        ),
        _issue(
            is_store & (_arr_len(bbox) == 4) & (bb[0] > bb[2]),
            "BBOX_ORDER_X",
        ),
        _issue(
            is_store & (_arr_len(bbox) == 4) & (bb[1] > bb[3]),
            "BBOX_ORDER_Y",
        ),
        _issue(is_store & (n_crs == 0), "CRS_MISSING"),
        _issue(is_store & (n_crs > 1), "CRS_MULTIPLE"),
        _issue(
            is_store
            & g("$['proj:code']").isNotNull()
            & ~g("$['proj:code']").rlike("^[A-Z]+:[0-9]+$"),
            "CRS_CODE_FORMAT",
        ),
        _issue(
            is_level & (shape.isNull() | (_arr_len(shape) != 2)),
            "SHAPE_LEN",
        ),
        _issue(
            is_level
            & (transform.isNull() | (_arr_len(transform) != 6)),
            "TRANSFORM_LEN",
        ),
        _issue(
            is_level & std_name.isNotNull() & ~std_name.isin(*CF_NAMES),
            "CF_NAME_UNKNOWN",
        ),
        _issue(has_pj & pj_type.isNull(), "PJ_TYPE_MISSING"),
        _issue(
            has_pj & pj_type.isNotNull() & ~pj_type.isin(*PROJJSON_CRS_TYPES),
            "PJ_TYPE_UNKNOWN",
        ),
        _issue(has_pj & pj_name.isNull(), "PJ_NAME_MISSING"),
        _issue(has_pj & pj_cs.isNotNull() & pj_axis.isNull(), "PJ_AXIS_MISSING"),
        _issue(
            has_pj & pj_axis.isNotNull() & ~pj_axis_n.between(1, 3),
            "PJ_AXIS_COUNT",
        ),
        _issue(
            has_pj
            & (pj_type == "ProjectedCRS")
            & (
                g("$['proj:projjson'].base_crs").isNull()
                | g("$['proj:projjson'].conversion").isNull()
            ),
            "PJ_PROJECTED_INCOMPLETE",
        ),
        # datum / ellipsoid / unit depth (VERDICT r3 item 4)
        _issue(
            has_datum
            & (datum_type.isNull() | ~datum_type.isin(*PROJJSON_DATUM_TYPES)),
            "PJ_DATUM_TYPE_UNKNOWN",
        ),
        _issue(has_datum & datum_name.isNull(), "PJ_DATUM_NAME_MISSING"),
        _issue(
            has_datum & datum_type.isin(*_GEODETIC_DATUM_TYPES) & ell.isNull(),
            "PJ_ELLIPSOID_MISSING",
        ),
        _issue(has_ell & ell_name.isNull(), "PJ_ELLIPSOID_NAME_MISSING"),
        # a valid ellipsoid is a sphere (radius) or a semi-major axis plus
        # one of semi-minor / inverse-flattening (OGC schema oneOf)
        _issue(
            has_ell
            & ~(
                ell_radius.isNotNull()
                | (
                    ell_smaj.isNotNull()
                    & (ell_smin.isNotNull() | ell_invf.isNotNull())
                )
            ),
            "PJ_ELLIPSOID_SHAPE",
        ),
        _issue(
            has_datum & pm.isNotNull() & pm_lon.isNull(),
            "PJ_PM_LONGITUDE_MISSING",
        ),
        _issue(has_pj & axis_dir_bad, "PJ_AXIS_DIR_UNKNOWN"),
        _issue(has_pj & axis_unit_bad, "PJ_AXIS_UNIT_BAD"),
    ]
    return (
        docs.select(
            "store_id", "doc_type", F.explode(F.array(*checks)).alias("code")
        )
        .filter(F.col("code").isNotNull())
        .orderBy("store_id", "doc_type", "code")
    )


# ---------------------------------------------------------------------------
# deterministic fixture documents: valid + one per failure mode
# ---------------------------------------------------------------------------


def _store(bbox=None, code=None, wkt2=None, projjson=None, skip_bbox=False):
    d = {}
    if not skip_bbox:
        d["spatial:bbox"] = bbox if bbox is not None else [15.0, 39.0, 18.0, 41.0]
    if code is not None:
        d["proj:code"] = code
    if wkt2 is not None:
        d["proj:wkt2"] = wkt2
    if projjson is not None:
        d["proj:projjson"] = projjson
    return json.dumps(d, sort_keys=True)


def _level(shape=(549, 549), transform=(100.0, 0.0, 600000.0, 0.0, -100.0, 5144900.0), std=None):
    d = {
        "spatial:shape": list(shape) if shape is not None else None,
        "spatial:transform": list(transform) if transform is not None else None,
    }
    d = {k: v for k, v in d.items() if v is not None}
    if std is not None:
        d["standard_name"] = std
    return json.dumps(d, sort_keys=True)


def _pj(
    type_="ProjectedCRS",
    name="WGS 84 / UTM zone 33N",
    axes: int | None = 2,
    cs=True,
    base=True,
    conv=True,
    datum: dict | None = None,
    axis_dir: str | None = None,
    axis_unit=None,
) -> dict:
    """Minimal PROJJSON CRS document (valid by default).

    ``datum`` embeds a datum subtree verbatim; ``axis_dir``/``axis_unit``
    override direction / set a unit on the FIRST axis.
    """
    d: dict = {}
    if type_ is not None:
        d["type"] = type_
    if name is not None:
        d["name"] = name
    if base:
        d["base_crs"] = {"type": "GeographicCRS", "name": "WGS 84"}
    if conv:
        d["conversion"] = {"type": "Conversion", "name": "UTM zone 33N"}
    if datum is not None:
        d["datum"] = datum
    if cs:
        csd: dict = {"type": "CoordinateSystem", "subtype": "Cartesian"}
        if axes is not None:
            axis = [
                {"name": "Easting", "abbreviation": "E", "direction": "east"},
                {"name": "Northing", "abbreviation": "N", "direction": "north"},
                {"name": "Up", "abbreviation": "U", "direction": "up"},
            ]
            axis = [dict(a) for a in (axis * ((axes + 2) // 3))[:axes]]
            if axis and axis_dir is not None:
                axis[0]["direction"] = axis_dir
            if axis and axis_unit is not None:
                axis[0]["unit"] = axis_unit
            csd["axis"] = axis
        d["coordinate_system"] = csd
    return d


_WGS84_ELLIPSOID = {
    "type": "Ellipsoid",
    "name": "WGS 84",
    "semi_major_axis": 6378137.0,
    "inverse_flattening": 298.257223563,
}

_WGS84_DATUM = {
    "type": "GeodeticReferenceFrame",
    "name": "World Geodetic System 1984",
    "ellipsoid": _WGS84_ELLIPSOID,
}


FIXTURE_DOCS = [
    ("s_ok_code", "store", _store(code="EPSG:32633")),
    ("s_ok_wkt", "store", _store(wkt2="PROJCRS[...]")),
    ("s_bbox_missing", "store", _store(code="EPSG:4326", skip_bbox=True)),
    ("s_bbox_len", "store", _store(bbox=[1.0, 2.0, 3.0], code="EPSG:4326")),
    ("s_bbox_order", "store", _store(bbox=[18.0, 41.0, 15.0, 39.0], code="EPSG:4326")),
    ("s_crs_missing", "store", _store()),
    ("s_crs_multi", "store", _store(code="EPSG:4326", wkt2="PROJCRS[...]")),
    ("s_code_fmt", "store", _store(code="epsg32633")),
    ("s_pj_ok", "store", _store(projjson=_pj())),
    ("s_pj_no_type", "store", _store(projjson=_pj(type_=None))),
    ("s_pj_bad_type", "store", _store(projjson=_pj(type_="FancyCRS"))),
    ("s_pj_no_name", "store", _store(projjson=_pj(name=None))),
    ("s_pj_axis_missing", "store", _store(projjson=_pj(axes=None))),
    ("s_pj_axis_count", "store", _store(projjson=_pj(axes=5))),
    ("s_pj_incomplete", "store", _store(projjson=_pj(base=False, conv=False))),
    # datum / ellipsoid / axis-unit depth fixtures (VERDICT r3 item 4)
    ("s_pj_datum_ok", "store", _store(projjson=_pj(datum=_WGS84_DATUM))),
    ("s_pj_datum_bad_type", "store",
     _store(projjson=_pj(datum={"type": "FancyDatum", "name": "x"}))),
    ("s_pj_datum_no_name", "store",
     _store(projjson=_pj(datum={"type": "GeodeticReferenceFrame",
                                "ellipsoid": _WGS84_ELLIPSOID}))),
    ("s_pj_ellipsoid_missing", "store",
     _store(projjson=_pj(datum={"type": "GeodeticReferenceFrame",
                                "name": "WGS84"}))),
    ("s_pj_ellipsoid_shape", "store",
     _store(projjson=_pj(datum={
         "type": "GeodeticReferenceFrame", "name": "WGS84",
         "ellipsoid": {"type": "Ellipsoid", "name": "odd",
                       "semi_major_axis": 6378137.0}}))),
    ("s_pj_sphere_ok", "store",
     _store(projjson=_pj(datum={
         "type": "GeodeticReferenceFrame", "name": "sphere",
         "ellipsoid": {"type": "Ellipsoid", "name": "GRS80 sphere",
                       "radius": 6371008.8}}))),
    ("s_pj_pm_no_lon", "store",
     _store(projjson=_pj(datum={
         "type": "GeodeticReferenceFrame", "name": "WGS84",
         "ellipsoid": _WGS84_ELLIPSOID,
         "prime_meridian": {"type": "PrimeMeridian", "name": "Greenwich"}}))),
    ("s_pj_axis_bad_dir", "store", _store(projjson=_pj(axis_dir="sideways"))),
    ("s_pj_axis_unit_bad", "store",
     _store(projjson=_pj(axis_unit={"type": "LinearUnit", "name": "metre"}))),
    ("s_pj_axis_unit_ok", "store",
     _store(projjson=_pj(axis_unit={"type": "LinearUnit", "name": "metre",
                                    "conversion_factor": 1.0}))),
    ("s_pj_axis_unit_str", "store", _store(projjson=_pj(axis_unit="metre"))),
    ("l_ok", "level", _level(std="toa_bidirectional_reflectance")),
    ("l_ok_nostd", "level", _level()),
    # valid CF name ABSENT from the old ~100-name curated subset — must be
    # accepted now that the full vendored table ships (VERDICT r3 item 3)
    ("l_ok_full_table", "level",
     _level(std="mass_concentration_of_pm2p5_ambient_aerosol_particles_in_air")),
    ("l_ok_snow", "level", _level(std="surface_snow_area_fraction")),
    ("l_shape_len", "level", _level(shape=(549, 549, 3))),
    ("l_shape_missing", "level", _level(shape=None)),
    ("l_transform_len", "level", _level(transform=(100.0, 0.0, 600000.0))),
    ("l_cf_unknown", "level", _level(std="not_a_cf_name")),
    # plausible-but-not-CF names (deprecated alias / wrong vocabulary) the
    # old subset wrongly listed as valid — must be rejected
    ("l_cf_deprecated", "level", _level(std="soil_moisture_content")),
    ("l_cf_invented", "level", _level(std="radar_cross_section")),
]


def _oracle_sql() -> str:
    """DuckDB twin: identical fixture docs, identical JSON-expression rules."""
    vals = ",\n         ".join(
        "(%s, %s, %s)"
        % tuple("'" + s.replace("'", "''") + "'" for s in (sid, dt, doc))
        for sid, dt, doc in FIXTURE_DOCS
    )
    names = ", ".join(f"'{n}'" for n in CF_NAMES)
    pj_types = ", ".join(f"'{t}'" for t in PROJJSON_CRS_TYPES)
    datum_types = ", ".join(f"'{t}'" for t in PROJJSON_DATUM_TYPES)
    geo_datum_types = ", ".join(f"'{t}'" for t in _GEODETIC_DATUM_TYPES)
    dirs = ", ".join(f"'{d}'" for d in PROJJSON_AXIS_DIRECTIONS)
    unit_types = ", ".join(f"'{t}'" for t in PROJJSON_UNIT_TYPES)
    # NOTE: ->> binds LOOSER than AND/NOT IN in DuckDB — every inline
    # extraction must be parenthesized or `AND doc` gets cast to BOOL
    _ax = '$."proj:projjson".coordinate_system.axis'
    axis_dir_bad = " OR ".join(
        f"""(json_extract(doc, '{_ax}[{i}]') IS NOT NULL
         AND ((doc->>'{_ax}[{i}].direction') IS NULL
              OR (doc->>'{_ax}[{i}].direction') NOT IN ({dirs})))"""
        for i in range(3)
    )
    axis_unit_bad = " OR ".join(
        f"""(json_extract(doc, '{_ax}[{i}].unit') IS NOT NULL
         AND json_type(json_extract(doc, '{_ax}[{i}].unit')) = 'OBJECT'
         AND (json_extract(doc, '{_ax}[{i}].unit.name') IS NULL
              OR json_extract(doc, '{_ax}[{i}].unit.conversion_factor') IS NULL
              OR ((doc->>'{_ax}[{i}].unit.type') IS NOT NULL
                  AND (doc->>'{_ax}[{i}].unit.type') NOT IN ({unit_types}))))"""
        for i in range(3)
    )
    return f"""
WITH docs(store_id, doc_type, doc) AS (
  VALUES {vals}
), c AS (
  SELECT store_id, doc_type,
    json_extract(doc, '$."spatial:bbox"') IS NOT NULL AS has_bbox,
    json_array_length(doc, '$."spatial:bbox"') AS bbox_n,
    TRY_CAST(doc->>'$."spatial:bbox"[0]' AS DOUBLE) AS x0,
    TRY_CAST(doc->>'$."spatial:bbox"[1]' AS DOUBLE) AS y0,
    TRY_CAST(doc->>'$."spatial:bbox"[2]' AS DOUBLE) AS x1,
    TRY_CAST(doc->>'$."spatial:bbox"[3]' AS DOUBLE) AS y1,
    (CASE WHEN json_extract(doc, '$."proj:code"') IS NOT NULL THEN 1 ELSE 0 END
     + CASE WHEN json_extract(doc, '$."proj:wkt2"') IS NOT NULL THEN 1 ELSE 0 END
     + CASE WHEN json_extract(doc, '$."proj:projjson"') IS NOT NULL THEN 1 ELSE 0 END) AS n_crs,
    doc->>'$."proj:code"' AS code,
    json_extract(doc, '$."spatial:shape"') IS NOT NULL AS has_shape,
    json_array_length(doc, '$."spatial:shape"') AS shape_n,
    json_extract(doc, '$."spatial:transform"') IS NOT NULL AS has_tr,
    json_array_length(doc, '$."spatial:transform"') AS tr_n,
    doc->>'$."standard_name"' AS std,
    json_extract(doc, '$."proj:projjson"') IS NOT NULL AS has_pj,
    doc->>'$."proj:projjson".type' AS pj_type,
    doc->>'$."proj:projjson".name' AS pj_name,
    json_extract(doc, '$."proj:projjson".coordinate_system') IS NOT NULL AS pj_has_cs,
    json_extract(doc, '$."proj:projjson".coordinate_system.axis') IS NOT NULL AS pj_has_axis,
    json_array_length(doc, '$."proj:projjson".coordinate_system.axis') AS pj_axis_n,
    json_extract(doc, '$."proj:projjson".base_crs') IS NOT NULL AS pj_has_base,
    json_extract(doc, '$."proj:projjson".conversion') IS NOT NULL AS pj_has_conv,
    json_extract(doc, '$."proj:projjson".datum') IS NOT NULL AS has_datum,
    doc->>'$."proj:projjson".datum.type' AS datum_type,
    doc->>'$."proj:projjson".datum.name' AS datum_name,
    json_extract(doc, '$."proj:projjson".datum.ellipsoid') IS NOT NULL AS has_ell,
    doc->>'$."proj:projjson".datum.ellipsoid.name' AS ell_name,
    json_extract(doc, '$."proj:projjson".datum.ellipsoid.semi_major_axis')
      IS NOT NULL AS ell_smaj,
    json_extract(doc, '$."proj:projjson".datum.ellipsoid.semi_minor_axis')
      IS NOT NULL AS ell_smin,
    json_extract(doc, '$."proj:projjson".datum.ellipsoid.inverse_flattening')
      IS NOT NULL AS ell_invf,
    json_extract(doc, '$."proj:projjson".datum.ellipsoid.radius')
      IS NOT NULL AS ell_radius,
    json_extract(doc, '$."proj:projjson".datum.prime_meridian')
      IS NOT NULL AS has_pm,
    json_extract(doc, '$."proj:projjson".datum.prime_meridian.longitude')
      IS NOT NULL AS has_pm_lon,
    ({axis_dir_bad}) AS axis_dir_bad,
    ({axis_unit_bad}) AS axis_unit_bad
  FROM docs
), issues AS (
  SELECT store_id, doc_type, 'BBOX_MISSING' AS code FROM c
    WHERE doc_type='store' AND NOT has_bbox
  UNION ALL SELECT store_id, doc_type, 'BBOX_LEN' FROM c
    WHERE doc_type='store' AND has_bbox AND bbox_n != 4
  UNION ALL SELECT store_id, doc_type, 'BBOX_ORDER_X' FROM c
    WHERE doc_type='store' AND bbox_n = 4 AND x0 > x1
  UNION ALL SELECT store_id, doc_type, 'BBOX_ORDER_Y' FROM c
    WHERE doc_type='store' AND bbox_n = 4 AND y0 > y1
  UNION ALL SELECT store_id, doc_type, 'CRS_MISSING' FROM c
    WHERE doc_type='store' AND n_crs = 0
  UNION ALL SELECT store_id, doc_type, 'CRS_MULTIPLE' FROM c
    WHERE doc_type='store' AND n_crs > 1
  UNION ALL SELECT store_id, doc_type, 'CRS_CODE_FORMAT' FROM c
    WHERE doc_type='store' AND code IS NOT NULL
      AND NOT regexp_matches(code, '^[A-Z]+:[0-9]+$')
  UNION ALL SELECT store_id, doc_type, 'SHAPE_LEN' FROM c
    WHERE doc_type='level' AND (NOT has_shape OR shape_n != 2)
  UNION ALL SELECT store_id, doc_type, 'TRANSFORM_LEN' FROM c
    WHERE doc_type='level' AND (NOT has_tr OR tr_n != 2*3)
  UNION ALL SELECT store_id, doc_type, 'CF_NAME_UNKNOWN' FROM c
    WHERE doc_type='level' AND std IS NOT NULL AND std NOT IN ({names})
  UNION ALL SELECT store_id, doc_type, 'PJ_TYPE_MISSING' FROM c
    WHERE doc_type='store' AND has_pj AND pj_type IS NULL
  UNION ALL SELECT store_id, doc_type, 'PJ_TYPE_UNKNOWN' FROM c
    WHERE doc_type='store' AND has_pj AND pj_type IS NOT NULL
      AND pj_type NOT IN ({pj_types})
  UNION ALL SELECT store_id, doc_type, 'PJ_NAME_MISSING' FROM c
    WHERE doc_type='store' AND has_pj AND pj_name IS NULL
  UNION ALL SELECT store_id, doc_type, 'PJ_AXIS_MISSING' FROM c
    WHERE doc_type='store' AND has_pj AND pj_has_cs AND NOT pj_has_axis
  UNION ALL SELECT store_id, doc_type, 'PJ_AXIS_COUNT' FROM c
    WHERE doc_type='store' AND has_pj AND pj_has_axis
      AND pj_axis_n NOT BETWEEN 1 AND 3
  UNION ALL SELECT store_id, doc_type, 'PJ_PROJECTED_INCOMPLETE' FROM c
    WHERE doc_type='store' AND has_pj AND pj_type = 'ProjectedCRS'
      AND NOT (pj_has_base AND pj_has_conv)
  UNION ALL SELECT store_id, doc_type, 'PJ_DATUM_TYPE_UNKNOWN' FROM c
    WHERE doc_type='store' AND has_pj AND has_datum
      AND (datum_type IS NULL OR datum_type NOT IN ({datum_types}))
  UNION ALL SELECT store_id, doc_type, 'PJ_DATUM_NAME_MISSING' FROM c
    WHERE doc_type='store' AND has_pj AND has_datum AND datum_name IS NULL
  UNION ALL SELECT store_id, doc_type, 'PJ_ELLIPSOID_MISSING' FROM c
    WHERE doc_type='store' AND has_pj AND has_datum
      AND datum_type IN ({geo_datum_types}) AND NOT has_ell
  UNION ALL SELECT store_id, doc_type, 'PJ_ELLIPSOID_NAME_MISSING' FROM c
    WHERE doc_type='store' AND has_pj AND has_datum AND has_ell
      AND ell_name IS NULL
  UNION ALL SELECT store_id, doc_type, 'PJ_ELLIPSOID_SHAPE' FROM c
    WHERE doc_type='store' AND has_pj AND has_datum AND has_ell
      AND NOT (ell_radius OR (ell_smaj AND (ell_smin OR ell_invf)))
  UNION ALL SELECT store_id, doc_type, 'PJ_PM_LONGITUDE_MISSING' FROM c
    WHERE doc_type='store' AND has_pj AND has_datum AND has_pm
      AND NOT has_pm_lon
  UNION ALL SELECT store_id, doc_type, 'PJ_AXIS_DIR_UNKNOWN' FROM c
    WHERE doc_type='store' AND has_pj AND axis_dir_bad
  UNION ALL SELECT store_id, doc_type, 'PJ_AXIS_UNIT_BAD' FROM c
    WHERE doc_type='store' AND has_pj AND axis_unit_bad
)
SELECT store_id, doc_type, code FROM issues
ORDER BY store_id, doc_type, code"""


@register("layout_validate", _oracle_sql())
def layout_validate(spark, sf_dir):
    """Validate the fixture store/layout documents; return the issue table."""
    docs = local_df(
        spark, FIXTURE_DOCS, "store_id string, doc_type string, doc string"
    )
    return validate_docs(docs)


# ---------------------------------------------------------------------------
# product detection from store group-path sets (reference: the S1/S2
# TypedDict hierarchies — data_api/s2.py:650-696, s1.py:894-922 — and
# `is_sentinel2_dataset`, s2_optimization/s2_converter.py:408-418)
# ---------------------------------------------------------------------------

#: second-level member names every S1 polarization group must carry
#: (s1.py:894-899: conditions / measurements / quality)
_S1_POL_MEMBERS = ("conditions", "measurements", "quality")

#: required members of each polarization's conditions group — the reference
#: models this as a CLOSED, total TypedDict (s1.py:576-592), so a conforming
#: S1 store carries ALL of them, gcp included
_S1_COND_MEMBERS = (
    "antenna_pattern",
    "attitude",
    "azimuth_fm_rate",
    "coordinate_conversion",
    "doppler_centroid",
    "gcp",
    "orbit",
    "reference_replica",
    "replica",
    "terrain_height",
)


def product_detect_df(paths: DataFrame) -> DataFrame:
    """Classify each store as S2 / S1 / generic from its group paths.

    ``paths``: tall table (store_id, path) — one row per zarr group path,
    the relational shape of ``GroupSpec.from_zarr`` at 10^12 groups.  Rules
    re-express the pydantic structural unions as aggregations:

    * **S2**: root members measurements+quality+conditions AND a
      ``measurements/reflectance/r{N}m`` resolution dataset
      (s2.py:650-696).
    * **S1**: at least one top-level polarization group with all of
      conditions/measurements/quality beneath it (s1.py:894-922), AND every
      polarization's conditions group carrying the full closed member set
      (antenna_pattern..terrain_height incl. gcp — s1.py:576-592 is a
      closed, total TypedDict).  A store whose polarization groups exist
      but miss conditions members (e.g. no GCP group) classifies
      **S1_partial**: structurally S1-shaped, fails reference validation.
    * S2 wins over S1 (a hierarchy satisfying both is resolved like the
      reference's ``TypeAdapter(Sentinel1Root | Sentinel2Root)`` + isinstance
      check in s2_converter.py:417).
    """
    p = F.col("path")
    parts = F.split(p, "/")
    flags = paths.groupBy("store_id").agg(
        F.max((p == "measurements").cast("int")).alias("has_m"),
        F.max((p == "quality").cast("int")).alias("has_q"),
        F.max((p == "conditions").cast("int")).alias("has_c"),
        F.max(p.rlike("^measurements/reflectance/r[0-9]+m$").cast("int")).alias(
            "has_res"
        ),
    )
    pol_groups = (
        paths.filter(
            (F.size(parts) == 2) & F.element_at(parts, 2).isin(*_S1_POL_MEMBERS)
        )
        .groupBy("store_id", F.element_at(parts, 1).alias("grp"))
        .agg(F.countDistinct(F.element_at(parts, 2)).alias("n_members"))
        .filter(F.col("n_members") == len(_S1_POL_MEMBERS))
        .select("store_id", "grp")
    )
    cond_members = (
        paths.filter(
            (F.size(parts) == 3)
            & (F.element_at(parts, 2) == "conditions")
            & F.element_at(parts, 3).isin(*_S1_COND_MEMBERS)
        )
        .groupBy("store_id", F.element_at(parts, 1).alias("grp"))
        .agg(F.countDistinct(F.element_at(parts, 3)).alias("n_cond"))
    )
    pol = (
        pol_groups.join(cond_members, ["store_id", "grp"], "left")
        .groupBy("store_id")
        .agg(
            F.count("*").alias("n_pol_groups"),
            F.sum(
                (
                    F.coalesce(F.col("n_cond"), F.lit(0))
                    == len(_S1_COND_MEMBERS)
                ).cast("int")
            ).alias("n_complete_pol"),
        )
    )
    is_s2 = (
        (F.col("has_m") == 1)
        & (F.col("has_q") == 1)
        & (F.col("has_c") == 1)
        & (F.col("has_res") == 1)
    )
    n_pol = F.coalesce(F.col("n_pol_groups"), F.lit(0))
    n_full = F.coalesce(F.col("n_complete_pol"), F.lit(0))
    return (
        flags.join(pol, "store_id", "left")
        .select(
            "store_id",
            F.when(is_s2, F.lit("S2"))
            .when((n_pol >= 1) & (n_full == n_pol), F.lit("S1"))
            .when(n_pol >= 1, F.lit("S1_partial"))
            .otherwise(F.lit("generic"))
            .alias("product"),
        )
        .orderBy("store_id")
    )


def _s1_pol_paths(pol: str, skip: tuple[str, ...] = ()) -> list[str]:
    """All group paths of one conforming polarization subtree, minus ``skip``."""
    out = [pol, f"{pol}/conditions", f"{pol}/measurements", f"{pol}/quality"]
    out += [
        f"{pol}/conditions/{m}" for m in _S1_COND_MEMBERS if m not in skip
    ]
    return out


PRODUCT_FIXTURE_PATHS = [
    # a complete S2 hierarchy
    *[("st_s2", p) for p in (
        "measurements", "measurements/reflectance",
        "measurements/reflectance/r10m", "measurements/reflectance/r20m",
        "measurements/reflectance/r60m", "quality", "quality/mask",
        "quality/atmosphere", "conditions", "conditions/geometry",
        "conditions/mask",
    )],
    # a two-polarization S1 hierarchy, full conditions member set per pol
    *[("st_s1", p) for p in _s1_pol_paths("VH") + _s1_pol_paths("VV")],
    # single-polarization S1
    *[("st_s1_hh", p) for p in _s1_pol_paths("HH")],
    # S1-shaped but one polarization's conditions group is missing its GCP
    # member (closed TypedDict violation, s1.py:587) -> S1_partial
    *[("st_s1_no_gcp", p)
      for p in _s1_pol_paths("VH") + _s1_pol_paths("VV", skip=("gcp",))],
    # S2 minus the conditions root member -> generic
    *[("st_almost_s2", p) for p in (
        "measurements", "measurements/reflectance",
        "measurements/reflectance/r10m", "quality",
    )],
    # polarization group missing quality -> generic
    *[("st_almost_s1", p) for p in ("VH", "VH/conditions", "VH/measurements")],
    ("st_generic", "data"),
    ("st_generic", "logs/a"),
]


def _product_oracle() -> str:
    vals = ", ".join(f"('{s}', '{p}')" for s, p in PRODUCT_FIXTURE_PATHS)
    members = ", ".join(f"'{m}'" for m in _S1_POL_MEMBERS)
    cond_members = ", ".join(f"'{m}'" for m in _S1_COND_MEMBERS)
    return f"""
WITH paths(store_id, path) AS (VALUES {vals}),
flags AS (
  SELECT store_id,
         MAX(CASE WHEN path = 'measurements' THEN 1 ELSE 0 END) AS has_m,
         MAX(CASE WHEN path = 'quality' THEN 1 ELSE 0 END) AS has_q,
         MAX(CASE WHEN path = 'conditions' THEN 1 ELSE 0 END) AS has_c,
         MAX(CASE WHEN regexp_matches(path, '^measurements/reflectance/r[0-9]+m$')
             THEN 1 ELSE 0 END) AS has_res
  FROM paths GROUP BY store_id),
pol_groups AS (
  SELECT store_id, string_split(path, '/')[1] AS grp
  FROM paths
  WHERE len(string_split(path, '/')) = 2
    AND string_split(path, '/')[2] IN ({members})
  GROUP BY store_id, string_split(path, '/')[1]
  HAVING COUNT(DISTINCT string_split(path, '/')[2]) = {len(_S1_POL_MEMBERS)}),
cond_members AS (
  SELECT store_id, string_split(path, '/')[1] AS grp,
         COUNT(DISTINCT string_split(path, '/')[3]) AS n_cond
  FROM paths
  WHERE len(string_split(path, '/')) = 3
    AND string_split(path, '/')[2] = 'conditions'
    AND string_split(path, '/')[3] IN ({cond_members})
  GROUP BY store_id, string_split(path, '/')[1]),
pol AS (
  SELECT g.store_id, COUNT(*) AS n_pol_groups,
         SUM(CASE WHEN COALESCE(c.n_cond, 0) = {len(_S1_COND_MEMBERS)}
             THEN 1 ELSE 0 END) AS n_complete_pol
  FROM pol_groups g LEFT JOIN cond_members c
    ON g.store_id = c.store_id AND g.grp = c.grp
  GROUP BY g.store_id)
SELECT f.store_id,
       CASE WHEN has_m = 1 AND has_q = 1 AND has_c = 1 AND has_res = 1 THEN 'S2'
            WHEN COALESCE(n_pol_groups, 0) >= 1
                 AND COALESCE(n_complete_pol, 0) = n_pol_groups THEN 'S1'
            WHEN COALESCE(n_pol_groups, 0) >= 1 THEN 'S1_partial'
            ELSE 'generic' END AS product
FROM flags f LEFT JOIN pol USING (store_id)
ORDER BY store_id"""


@register("product_detect", _product_oracle())
def product_detect(spark, sf_dir):
    """Classify the fixture stores as S1/S2/generic from group-path sets."""
    paths = local_df(spark, PRODUCT_FIXTURE_PATHS, "store_id string, path string")
    return product_detect_df(paths)


# ---------------------------------------------------------------------------
# Zarr-store -> document-table bridge (the reference's `validate STORE`
# workflow, cli.py + data_api/geozarr/store.py: open the store, build the
# layout documents, run the compliance rules)
# ---------------------------------------------------------------------------


def docs_from_zarr_store(root: str) -> list[tuple[str, str, str]]:
    """Derive (store_id, doc_type, doc) rows from an on-disk Zarr v3 store.

    One 'store' document per multiscales group (bbox from the finest
    level's anchor/extent, CRS from member-array ``proj:code``) and one
    'level' document per layout entry (affine ``spatial:transform`` from
    scale+translation, ``standard_name`` carried through) — the same
    shapes ``validate_docs`` checks, so `validate --zarr STORE` runs the
    full rule set against what the sink actually wrote.  Driver-side and
    bounded: groups x levels rows, no chunk I/O.
    """
    from ..sources.zarr_store import open_store

    nodes = open_store(root)
    docs: list[tuple[str, str, str]] = []
    for path, m in sorted(nodes.items()):
        ms = (
            m.get("attributes", {}).get("multiscales")
            if m["node_type"] == "group"
            else None
        )
        if not ms or not ms.get("layout"):
            continue
        layout = ms["layout"]
        proj = std = None
        for p2, m2 in nodes.items():
            if m2["node_type"] == "array" and p2.startswith(path + "/"):
                proj = proj or m2["attributes"].get("proj:code")
                std = std or m2["attributes"].get("standard_name")
        finest = layout[0]
        px = float(finest["scale"][0])
        tx, ty = (float(v) for v in finest["translation"])
        store_doc: dict = {
            "spatial:bbox": [
                tx,
                ty - finest["height"] * px,
                tx + finest["width"] * px,
                ty,
            ]
        }
        if proj is not None:
            store_doc["proj:code"] = proj
        docs.append((path, "store", json.dumps(store_doc, sort_keys=True)))
        for entry in layout:
            epx = float(entry["scale"][0])
            etx, ety = (float(v) for v in entry["translation"])
            d: dict = {
                "spatial:shape": [entry["height"], entry["width"]],
                "spatial:transform": [epx, 0.0, etx, 0.0, -epx, ety],
            }
            if std is not None:
                d["standard_name"] = std
            docs.append(
                (f"{path}/{entry['asset']}", "level", json.dumps(d, sort_keys=True))
            )
    return docs
