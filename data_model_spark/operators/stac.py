"""Per-scene STAC-style catalog items derived from the image table —
pure JVM column arithmetic, zero shuffle, no pixel decode.

The reference round-trips STAC/CF attributes on its stores
(`src/eopf_geozarr/conversion/geozarr.py` spatial_ref / multiscales
metadata; `data_api/geozarr/common.py` attribute validation); this
operator emits the catalog row a harvester would index per scene:
item id, band, integer UTM footprint, EPSG, pixel area, and the
level-0 tile span — everything derivable from (image_id, w, h) alone.

Scale design: a narrow projection over the image-table scan (the
deterministic grid arithmetic of ``sources/images.py:scene_anchor`` as
column expressions — no UDF, no shuffle, whole-stage codegen); at
10^12 rows this is a single scan-rate pass, and the plan gate asserts
zero exchanges and no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import images as img_src
from .registry import register
from .tiling import TILE_PX

_PX = int(img_src.PIXEL_SIZE_M)


def stac_items(images: DataFrame) -> DataFrame:
    """(image_id, w, h, caption, phash) -> one catalog item per scene.

    Footprint corners are exact integers (anchors and dims are
    pixel-aligned); ``tiles_x/tiles_y`` is the level-0 global-grid span
    the scene intersects — the fan-out the tiler will produce."""
    i = F.substring("image_id", 5, 12).cast("long")
    ax = F.lit(int(img_src.ANCHOR_X0)) + (i % img_src.GRID_COLS) * F.lit(
        int(img_src.GRID_STEP_M)
    )
    ay = F.lit(int(img_src.ANCHOR_Y0)) + F.floor(i / img_src.GRID_COLS) * F.lit(
        int(img_src.GRID_STEP_M)
    )
    band = F.element_at(
        F.array(*[F.lit(b) for b in img_src.BANDS]),
        (i % len(img_src.BANDS) + 1).cast("int"),
    )
    ax_px, ay_px = ax / _PX, ay / _PX
    tiles_x = (
        F.floor((ax_px + F.col("w") - 1) / TILE_PX) - F.floor(ax_px / TILE_PX) + 1
    )
    tiles_y = (
        F.floor((ay_px + F.col("h") - 1) / TILE_PX) - F.floor(ay_px / TILE_PX) + 1
    )
    return images.select(
        F.concat("image_id", F.lit("_"), band).alias("item_id"),
        "image_id",
        band.alias("band"),
        F.lit(img_src.SCENE_EPSG).alias("epsg"),
        ax.cast("long").alias("bbox_minx"),
        ay.cast("long").alias("bbox_miny"),
        (ax + F.col("w") * _PX).cast("long").alias("bbox_maxx"),
        (ay + F.col("h") * _PX).cast("long").alias("bbox_maxy"),
        (F.col("w").cast("long") * F.col("h")).alias("area_px"),
        tiles_x.cast("int").alias("tiles_x"),
        tiles_y.cast("int").alias("tiles_y"),
        "caption",
    )


_STAC_N = 500


def _oracle() -> str:
    """Driver-side replay over the deterministic scene grid — the same
    arithmetic in plain Python, emitted as a VALUES literal."""
    rows = []
    for i in range(_STAC_N):
        w, h = img_src.image_dims(i)
        ax, ay = img_src.scene_anchor(i)
        band = img_src.band_for(i)
        image_id = f"img_{i:012d}"
        ax_px, ay_px = round(ax / _PX), round(ay / _PX)
        rows.append(
            (
                f"{image_id}_{band}", image_id, band, img_src.SCENE_EPSG,
                int(ax), int(ay), int(ax + w * _PX), int(ay + h * _PX),
                w * h,
                (ax_px + w - 1) // TILE_PX - ax_px // TILE_PX + 1,
                (ay_px + h - 1) // TILE_PX - ay_px // TILE_PX + 1,
                img_src.caption_for(image_id, i),
            )
        )
    from .mosaic_fp import _values_sql

    return _values_sql(
        [
            ("item_id", "VARCHAR"),
            ("image_id", "VARCHAR"),
            ("band", "VARCHAR"),
            ("epsg", "INTEGER"),
            ("bbox_minx", "BIGINT"),
            ("bbox_miny", "BIGINT"),
            ("bbox_maxx", "BIGINT"),
            ("bbox_maxy", "BIGINT"),
            ("area_px", "BIGINT"),
            ("tiles_x", "INTEGER"),
            ("tiles_y", "INTEGER"),
            ("caption", "VARCHAR"),
        ],
        rows,
    )


@register("stac_items", _oracle)
def stac_items_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog items for the first 500 scenes of the deterministic
    image table — scan-only, zero-shuffle metadata derivation."""
    images = img_src.generate_images_df(spark, _STAC_N)
    return stac_items(images)
