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

# static subset of the CF standard-name table the reference fetches at
# import time (common.py:122-139) — the names this engine's products use
CF_NAMES = (
    "toa_bidirectional_reflectance",
    "surface_bidirectional_reflectance",
    "latitude",
    "longitude",
    "projection_x_coordinate",
    "projection_y_coordinate",
    "altitude",
    "cloud_area_fraction",
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


FIXTURE_DOCS = [
    ("s_ok_code", "store", _store(code="EPSG:32633")),
    ("s_ok_wkt", "store", _store(wkt2="PROJCRS[...]")),
    ("s_bbox_missing", "store", _store(code="EPSG:4326", skip_bbox=True)),
    ("s_bbox_len", "store", _store(bbox=[1.0, 2.0, 3.0], code="EPSG:4326")),
    ("s_bbox_order", "store", _store(bbox=[18.0, 41.0, 15.0, 39.0], code="EPSG:4326")),
    ("s_crs_missing", "store", _store()),
    ("s_crs_multi", "store", _store(code="EPSG:4326", wkt2="PROJCRS[...]")),
    ("s_code_fmt", "store", _store(code="epsg32633")),
    ("l_ok", "level", _level(std="toa_bidirectional_reflectance")),
    ("l_ok_nostd", "level", _level()),
    ("l_shape_len", "level", _level(shape=(549, 549, 3))),
    ("l_shape_missing", "level", _level(shape=None)),
    ("l_transform_len", "level", _level(transform=(100.0, 0.0, 600000.0))),
    ("l_cf_unknown", "level", _level(std="not_a_cf_name")),
]


def _oracle_sql() -> str:
    """DuckDB twin: identical fixture docs, identical JSON-expression rules."""
    vals = ",\n         ".join(
        "(%s, %s, %s)"
        % tuple("'" + s.replace("'", "''") + "'" for s in (sid, dt, doc))
        for sid, dt, doc in FIXTURE_DOCS
    )
    names = ", ".join(f"'{n}'" for n in CF_NAMES)
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
    doc->>'$."standard_name"' AS std
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
