"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with typed metadata columns
(w/h/fmt for images; sample-rate/duration for audio; fps/frames for video).
The Spark-side plumbing — schema, Arrow batching, partitioning, UDF
signatures, batch shapes — is real and tested; the *codec* layer for formats
that need external libraries is stubbed behind clearly-marked
``NotImplementedError`` (this container has no PIL/ffmpeg), with the
grayscale PNG / raw-u16 path fully functional via our pure-NumPy codecs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_image
from ..operators.downsample import block_mean

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("mean", T.DoubleType(), False),
        T.StructField("std", T.DoubleType(), False),
        T.StructField("p05", T.DoubleType(), False),
        T.StructField("p95", T.DoubleType(), False),
        T.StructField("edge_energy", T.DoubleType(), False),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("thumb", T.ArrayType(T.DoubleType()), False),
    ]
)


def extract_features(images: DataFrame) -> DataFrame:
    """Per-image statistical features, one Arrow batch at a time."""

    def feats(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                a = decode_image(row.bytes, row.fmt, row.w, row.h).astype(np.float64)
                gy, gx = np.gradient(a)
                recs.append(
                    {
                        "image_id": row.image_id,
                        "mean": float(a.mean()),
                        "std": float(a.std()),
                        "p05": float(np.percentile(a, 5)),
                        "p95": float(np.percentile(a, 95)),
                        "edge_energy": float(np.mean(np.hypot(gy, gx))),
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return images.mapInPandas(feats, FEATURE_SCHEMA)


def resize_thumbnails(images: DataFrame, thumb: int = 8) -> DataFrame:
    """Block-mean thumbnails (the decode->resize stage of a caption pipeline)."""

    def resize(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                a = decode_image(row.bytes, row.fmt, row.w, row.h).astype(np.float64)
                th = block_mean(a, thumb, thumb)
                recs.append(
                    {
                        "image_id": row.image_id,
                        "w": int(row.w),
                        "h": int(row.h),
                        "thumb": [float(v) for v in np.asarray(th).ravel()],
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return images.mapInPandas(resize, RESIZE_SCHEMA)


def decode_audio_stub(payload: bytes, fmt: str) -> np.ndarray:
    """STUB: audio decode requires codec libraries absent from this container.

    The Spark plumbing (binary column in, float frames out via mapInPandas)
    is identical to :func:`extract_features`; swap this function for a real
    decoder (e.g. soundfile) on a production image.
    """
    raise NotImplementedError(
        "audio decode requires an audio codec library not present in this container"
    )


def sample_video_frames_stub(payload: bytes, fmt: str, every_n: int) -> list[np.ndarray]:
    """STUB: video frame sampling requires ffmpeg-class libraries (absent)."""
    raise NotImplementedError(
        "video frame sampling requires a video codec library not present in this container"
    )


def caption_tokens(images: DataFrame) -> DataFrame:
    """Caption-side of the multimodal pair: JVM-only token stats."""
    return images.select(
        "image_id",
        F.size(F.split(F.trim("caption"), " +")).alias("n_caption_tokens"),
        F.length("caption").alias("caption_chars"),
    )


# ---------------------------------------------------------------------------
# registered queries (rows-only: the image table is engine-generated, not a
# DuckDB view; exact kernels are golden-tested in tests/test_streaming_multimodal.py)
# ---------------------------------------------------------------------------

from ..sources.images import generate_images_df  # noqa: E402
from .registry import register  # noqa: E402

_N_IMG_QUERY = 48  # deterministic fixture size for the driver's rows-only check


@register("image_features", None)
def image_features(spark, sf_dir):
    """Decode + per-image feature extraction (mean/std/percentiles/edges)."""
    return extract_features(generate_images_df(spark, _N_IMG_QUERY)).orderBy("image_id")


@register("image_thumbnails", None)
def image_thumbnails(spark, sf_dir):
    """Decode -> 8x8 block-mean thumbnail per image (resize plumbing)."""
    return resize_thumbnails(generate_images_df(spark, _N_IMG_QUERY)).select(
        "image_id", "w", "h", F.size("thumb").alias("thumb_len")
    )


@register("caption_token_stats", None)
def caption_token_stats(spark, sf_dir):
    """Caption-side token stats of the image+caption pair table (JVM-only)."""
    return caption_tokens(generate_images_df(spark, _N_IMG_QUERY))


@register("phash_neardup_pairs", None)
def phash_neardup_pairs(spark, sf_dir):
    """Image near-dup pairs via 64-bit phash: banded 16-bit chunk join.

    The image twin of SimHash doc dedup — candidates share one of four
    16-bit phash chunks (hamming<=3 guarantees a clean chunk by pigeonhole),
    then exact ``bit_count`` refinement. Scales as an equi-join on the chunk
    key instead of an all-pairs scan.
    """
    imgs = generate_images_df(spark, _N_IMG_QUERY).select("image_id", "phash")
    chunks = imgs.select(
        "image_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned("phash", 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("image_id", "phash", "ck.chunk", "ck.cv")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            F.col("a.phash").alias("ha"),
            F.col("b.phash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= 3)
        .select("img_a", "img_b", "hamming")
    )
