"""Deterministic synthetic image+caption table (FIXTURES.md §1).

Schema matches BASELINE.json ``input_hint`` exactly:
``(image_id string, bytes binary, w int, h int, fmt string, caption string,
phash bigint)``.

Everything is derivable from ``image_id`` alone (seeded NumPy per image), so
the table is self-contained: footprints, original pixels, and phash can all
be recomputed oracle-side without storing extra columns.  Generation runs
*distributed* via ``mapInPandas`` over ``spark.range`` — at 10^12 rows this
is an embarrassingly parallel scan with no shuffle; locally the same code
path produces the test fixtures.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..codecs import encode_image, encode_image_with_decoded  # noqa: F401
from ..functions import crs

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

FMTS = ("raw-u16", "png", "jpeg")
DIM_CYCLE = (64, 256, 512)

#: band cycle (reference: S2 band-by-band datasets, `conversion/geozarr.py:
#: 974-1183`): reflectance bands + classification (scl) + probability
#: (cld, snw) + aerosol/water-vapour (aot, wvp), so the pyramid pipeline
#: exercises the full A10 kernel dispatch (mean / center-pick /
#: clamped-mean) end-to-end.  Length 16 DIVIDES the 64-column scene grid:
#: vertically adjacent scenes in a grid column (i, i+64) share a band, so
#: same-band scene overlap — the merge-compositing case — exists by
#: construction at any scale.
BANDS = (
    "b01", "b02", "b03", "b04", "b05", "b06", "b07", "b08", "b8a",
    "b11", "b12", "aot", "wvp", "scl", "cld", "snw",
)

# scene grid anchoring (FIXTURES.md §1): UTM EPSG:32632 squares on a step grid
SCENE_EPSG = 32632
ANCHOR_X0 = 600000.0
ANCHOR_Y0 = 5090000.0
GRID_COLS = 64
GRID_STEP_M = 2560.0  # one 256-px tile at 10 m — scenes align with the tile grid
PIXEL_SIZE_M = 10.0


def image_seed(image_id: str) -> int:
    """Stable per-image 32-bit seed (crc32 — not Python's salted hash)."""
    return zlib.crc32(image_id.encode("utf-8")) & 0xFFFFFFFF


def image_index(image_id: str) -> int:
    return int(image_id.split("_")[1])


def image_dims(i: int, dim_cycle=DIM_CYCLE) -> tuple[int, int]:
    """(w, h) for image index i — cycled deterministically, non-square mix."""
    w = dim_cycle[i % len(dim_cycle)]
    h = dim_cycle[(i // len(dim_cycle)) % len(dim_cycle)]
    return w, h


def band_for(i: int) -> str:
    """Band (variable) of image row i — the multi-band dimension."""
    return BANDS[i % len(BANDS)]


def _band_of_id(image_id: str) -> str:
    try:
        return band_for(image_index(image_id))
    except (IndexError, ValueError):
        return "b02"  # free-form test ids default to a reflectance band


def image_fmt(i: int) -> str:
    # classification / probability bands are never lossy-encoded (a JPEG'd
    # class mask is semantically wrong and PSNR-meaningless)
    if band_for(i) in ("scl", "cld", "snw"):
        return "png" if i % 2 else "raw-u16"
    return FMTS[i % len(FMTS)]


def synth_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Seeded uint16 ground-truth pixels, value range appropriate to the band:
    reflectance 500..5000-ish, scl classes 0..11, cld probabilities 0..100."""
    rng = np.random.default_rng(image_seed(image_id))
    band = _band_of_id(image_id)
    if band == "scl":
        return rng.integers(0, 12, size=(h, w), dtype=np.uint16)
    if band in ("cld", "snw"):
        return rng.integers(0, 101, size=(h, w), dtype=np.uint16)
    base = rng.integers(500, 3000, size=(h, w), dtype=np.uint16)
    # add smooth structure so lossy PSNR is meaningful (not pure noise)
    yy, xx = np.mgrid[0:h, 0:w]
    wave = (1000 * (np.sin(xx / 17.0) * np.cos(yy / 23.0) + 1)).astype(np.uint16)
    return (base + wave).astype(np.uint16)


def phash64(pixels: np.ndarray) -> int:
    """Deterministic 64-bit perceptual-style hash of decoded pixels.

    8x8 block-mean downsample -> threshold at the median -> 64 bits.
    Derivable oracle-side from the decoded image alone.
    """
    a = np.asarray(pixels, dtype=np.float64)
    h, w = a.shape
    by, bx = max(h // 8, 1), max(w // 8, 1)
    cropped = a[: by * 8, : bx * 8] if h >= 8 and w >= 8 else np.resize(a, (8, 8))
    if h >= 8 and w >= 8:
        blocks = cropped.reshape(8, by, 8, bx).mean(axis=(1, 3))
    else:
        blocks = cropped
    bits = (blocks > np.median(blocks)).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= (1 << 63) else val


def caption_for(image_id: str, i: int) -> str:
    return f"scene {image_id} band {band_for(i)} utm{SCENE_EPSG}"


def scene_anchor(i: int) -> tuple[float, float]:
    """UTM anchor of scene i on the deterministic step grid."""
    return (
        ANCHOR_X0 + (i % GRID_COLS) * GRID_STEP_M,
        ANCHOR_Y0 + (i // GRID_COLS) * GRID_STEP_M,
    )


def footprint_utm(image_id: str, w: int, h: int) -> np.ndarray:
    """Scene footprint: UTM square of (w*10m x h*10m) anchored on the grid."""
    i = image_index(image_id)
    ax, ay = scene_anchor(i)
    return np.array(
        [[ax, ay], [ax + w * PIXEL_SIZE_M, ay], [ax + w * PIXEL_SIZE_M, ay + h * PIXEL_SIZE_M], [ax, ay + h * PIXEL_SIZE_M]]
    )


def footprint_lonlat(image_id: str, w: int, h: int) -> np.ndarray:
    poly = footprint_utm(image_id, w, h)
    lon, lat = crs.utm_to_lonlat(poly[:, 0], poly[:, 1], *crs.epsg_to_utm_zone(SCENE_EPSG))
    return np.column_stack([lon, lat])


def revision_id(i: int, rev: int | None) -> str:
    """Image id of revision ``rev`` of scene ``i`` (None/0 = original).

    The scene index stays the second ``_`` field, so ``image_index`` (and
    everything keyed on it: dims, anchor, band, fmt) is revision-invariant,
    while the full id — and therefore the pixel seed — changes per
    revision: a reprocessed scene has the same footprint, new content.
    """
    return f"img_{i:012d}" + (f"_r{rev}" if rev else "")


def _rows_for_indices(
    indices: np.ndarray, dim_cycle, rev: int | None = None
) -> pd.DataFrame:
    recs = []
    for i in indices:
        i = int(i)
        image_id = revision_id(i, rev)
        w, h = image_dims(i, dim_cycle)
        fmt = image_fmt(i)
        pixels = synth_pixels(image_id, w, h)
        # encoder-side reconstruction: identical to decode_image(data, ...)
        # (entropy coding is lossless) without the entropy-decode pass
        data, decoded = encode_image_with_decoded(pixels, fmt)
        recs.append(
            {
                "image_id": image_id,
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": caption_for(image_id, i),
                "phash": phash64(decoded),
            }
        )
    return pd.DataFrame.from_records(recs)


def generate_images_pandas(n: int, dim_cycle=DIM_CYCLE) -> pd.DataFrame:
    """Driver-side generation (tests / tiny fixtures)."""
    return _rows_for_indices(np.arange(n), dim_cycle)


def generate_images_pandas_for(indices, dim_cycle=DIM_CYCLE) -> pd.DataFrame:
    """Driver-side generation of SPECIFIC scene indices — e.g. the
    same-band vertically-overlapping pairs (i, i+64) for merge-composite
    fixtures."""
    return _rows_for_indices(np.asarray(list(indices)), dim_cycle)


def generate_images_df(
    spark: SparkSession, n: int, num_partitions: int | None = None, dim_cycle=DIM_CYCLE
) -> DataFrame:
    """Distributed generation: ``spark.range(n)`` -> ``mapInPandas`` encode.

    No shuffle; each partition generates its id range independently, which is
    exactly how a 10^12-row synthetic table would be materialized on a
    cluster (scan-only, linear scaling).  Partition count: two wavefuls of
    tasks (2x shuffle width), capped at the row count — heavy per-image
    tasks need parallelism, not the per-row task floods
    ``default.parallelism`` (sized for billion-row JVM generators) gives
    (512 images: 256 tasks 2.2 s -> 64 tasks 1.3 s, mapInPandas per-task
    overhead dominating).
    """
    if num_partitions is None:
        width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        num_partitions = max(1, min(n, 2 * max(width, 4)))

    def gen(batches):
        for pdf in batches:
            yield _rows_for_indices(pdf["id"].to_numpy(), dim_cycle)

    out = spark.range(0, n, numPartitions=num_partitions).mapInPandas(
        gen, IMAGE_SCHEMA
    )
    # marker for tiling.build_tiles: an un-cached generator plan can fuse
    # the generate and cut kernels into one Python stage (same kernels,
    # same bytes — the Arrow round-trip of every encoded image between two
    # MapInPandas nodes is the only thing removed)
    out._dms_fixture_gen = (n, num_partitions, dim_cycle)
    return out


def generate_revision_df(
    spark: SparkSession,
    indices,
    rev: int,
    num_partitions: int | None = None,
    dim_cycle=DIM_CYCLE,
) -> DataFrame:
    """Reprocessed copies (revision ``rev``) of specific scene indices.

    Same distributed scan shape as ``generate_images_df``; footprints match
    the originals (index-keyed), pixel content is the revision's own.
    """
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 8)
    idx = [int(i) for i in indices]

    def gen(batches):
        for pdf in batches:
            yield _rows_for_indices(pdf["i"].to_numpy(), dim_cycle, rev=rev)

    src = spark.createDataFrame([(i,) for i in idx], "i long").repartition(
        min(num_partitions, max(len(idx), 1))
    )
    return src.mapInPandas(gen, IMAGE_SCHEMA)


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("var", T.StringType(), False),
    ]
)


def generate_images_meta_df(
    spark: SparkSession, n: int, num_partitions: int | None = None
) -> DataFrame:
    """Metadata columns of the image table WITHOUT pixel synthesis/encode.

    Same distributed scan shape as ``generate_images_df`` (spark.range ->
    mapInPandas, no shuffle) but only evaluates the deterministic
    dim/fmt/band cycles — for metadata-profiling queries that would
    otherwise pay full pixel generation just to discard everything but
    (w, h, fmt).
    """
    if num_partitions is None:
        width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        num_partitions = max(1, min(n, 2 * max(width, 4)))

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "image_id": [f"img_{int(i):012d}" for i in idx],
                    "w": np.array([image_dims(int(i))[0] for i in idx], dtype=np.int32),
                    "h": np.array([image_dims(int(i))[1] for i in idx], dtype=np.int32),
                    "fmt": [image_fmt(int(i)) for i in idx],
                    "var": [band_for(int(i)) for i in idx],
                }
            )

    return spark.range(0, n, numPartitions=num_partitions).mapInPandas(
        gen, IMAGE_META_SCHEMA
    )
