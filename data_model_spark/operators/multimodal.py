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
