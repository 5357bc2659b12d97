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


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
        T.StructField("peak", T.DoubleType(), False),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("clip_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_mean", T.DoubleType(), False),
        T.StructField("frame_bytes", T.BinaryType(), False),
    ]
)


def decode_audio(payload: bytes, fmt: str) -> np.ndarray:
    """Audio decode to float64 mono in [-1, 1].

    * ``wav`` — REAL RIFF/WAVE PCM container (``codecs/wav.py``, written
      from the public spec; multichannel mixes down by mean).
    * ``fake-pcm16`` — raw little-endian int16 PCM (deterministic twin).
    * compressed codecs (mp3/flac/aac/...) need an audio library absent
      from this container — clearly-marked stub; the Spark plumbing
      (binary column, Arrow batches, UDF signature) is identical.
    """
    if fmt == "wav":
        from ..codecs.wav import decode_wav

        x, _rate = decode_wav(payload)
        return x[:, 0] if x.shape[1] == 1 else x.mean(axis=1)
    if fmt == "fake-pcm16":
        return np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    raise NotImplementedError(
        f"audio decode for fmt={fmt!r} requires an audio codec library "
        "not present in this container (plumbing is real; swap this decoder)"
    )


def extract_audio_features(clips: DataFrame) -> DataFrame:
    """Audio twin of :func:`extract_features`: (clip_id, payload binary,
    fmt, sample_rate) -> per-clip RMS / zero-crossings / peak, one Arrow
    batch at a time — the UDF signature and batch shape a real decoder
    would drop into unchanged."""

    def feats(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                x = decode_audio(row.payload, row.fmt)
                recs.append(
                    {
                        "clip_id": row.clip_id,
                        "sample_rate": int(row.sample_rate),
                        "n_samples": len(x),
                        "rms": float(np.sqrt(np.mean(x**2))) if len(x) else 0.0,
                        "zero_crossings": int(np.sum(np.abs(np.diff(np.signbit(x))))),
                        "peak": float(np.max(np.abs(x))) if len(x) else 0.0,
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return clips.mapInPandas(feats, AUDIO_FEATURE_SCHEMA)


def decode_video_frames(payload: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Video decode to (n_frames, h, w) uint8.

    * ``y4m`` — REAL YUV4MPEG2 container (``codecs/y4m.py``, from the
      public yuv4mpeg spec; luma plane per frame).
    * ``fake-rawgray`` — concatenated grayscale frames (deterministic twin).
    * compressed codecs (h264/vp9/...) need ffmpeg-class libraries —
      clearly-marked stub, identical Spark plumbing.
    """
    if fmt == "y4m":
        from ..codecs.y4m import decode_y4m

        frames, _fps = decode_y4m(payload)
        return frames
    if fmt == "fake-rawgray":
        a = np.frombuffer(payload, dtype=np.uint8)
        n = len(a) // (w * h)
        return a[: n * w * h].reshape(n, h, w)
    raise NotImplementedError(
        f"video decode for fmt={fmt!r} requires ffmpeg-class libraries "
        "not present in this container (plumbing is real; swap this decoder)"
    )


def sample_video_frames(clips: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: (clip_id, payload, fmt, w, h) -> every Nth frame with
    its mean and re-encoded bytes. One input row fans out to many output
    rows (UDTF shape) inside ``mapInPandas``."""

    def sample(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                frames = decode_video_frames(row.payload, row.fmt, row.w, row.h)
                for idx in range(0, len(frames), every_n):
                    f = frames[idx]
                    recs.append(
                        {
                            "clip_id": row.clip_id,
                            "frame_idx": idx,
                            "frame_mean": float(f.mean()),
                            "frame_bytes": f.tobytes(),
                        }
                    )
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in FRAME_SCHEMA.fields}
            )

    return clips.mapInPandas(sample, FRAME_SCHEMA)


def synth_audio_clips(spark, n: int = 16) -> DataFrame:
    """Deterministic fake-pcm16 clip table (distributed generation)."""

    def gen(batches):
        for pdf in batches:
            recs = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(1000 + i)
                t = np.arange(4000 + 100 * (i % 5))
                wave = 0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t / 16000.0)
                wave += rng.normal(0, 0.01, len(t))
                pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2")
                recs.append(
                    {
                        "clip_id": f"clip_{i:06d}",
                        "payload": pcm.tobytes(),
                        "fmt": "fake-pcm16",
                        "sample_rate": 16000,
                    }
                )
            yield pd.DataFrame.from_records(recs)

    schema = "clip_id string, payload binary, fmt string, sample_rate int"
    return spark.range(0, n, numPartitions=4).mapInPandas(gen, schema)


def _wav_samples(i: int) -> tuple[np.ndarray, int, int]:
    """Deterministic per-clip samples: (float samples, rate, channels)."""
    rng = np.random.default_rng(2000 + i)
    rate = 16000 if i % 2 == 0 else 8000
    channels = 1 if i % 3 else 2
    t = np.arange(2000 + 250 * (i % 4))
    wave = 0.4 * np.sin(2 * np.pi * (110 + 30 * i) * t / rate)
    wave = wave[:, None] if channels == 1 else np.stack(
        [wave, 0.2 * np.cos(2 * np.pi * (55 + 10 * i) * t / rate)], axis=1
    )
    wave = wave + rng.normal(0, 0.01, wave.shape)
    return np.clip(wave, -1, 1), rate, channels


def synth_wav_clips(spark, n: int = 12) -> DataFrame:
    """Deterministic REAL-WAV clip table (distributed generation)."""
    from ..codecs.wav import encode_wav_pcm16

    def gen(batches):
        for pdf in batches:
            recs = []
            for i in pdf["id"]:
                i = int(i)
                wave, rate, channels = _wav_samples(i)
                recs.append(
                    {
                        "clip_id": f"wav_{i:06d}",
                        "payload": encode_wav_pcm16(wave, rate, channels),
                        "fmt": "wav",
                        "sample_rate": rate,
                    }
                )
            yield pd.DataFrame.from_records(recs)

    schema = "clip_id string, payload binary, fmt string, sample_rate int"
    return spark.range(0, n, numPartitions=4).mapInPandas(gen, schema)


def synth_video_clips(spark, n: int = 8, w: int = 32, h: int = 24, frames: int = 12) -> DataFrame:
    """Deterministic fake-rawgray clip table."""

    def gen(batches):
        for pdf in batches:
            recs = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(2000 + i)
                vid = rng.integers(0, 255, size=(frames, h, w), dtype=np.uint8)
                recs.append(
                    {
                        "clip_id": f"vid_{i:06d}",
                        "payload": vid.tobytes(),
                        "fmt": "fake-rawgray",
                        "w": w,
                        "h": h,
                    }
                )
            yield pd.DataFrame.from_records(recs)

    schema = "clip_id string, payload binary, fmt string, w int, h int"
    return spark.range(0, n, numPartitions=2).mapInPandas(gen, schema)


def caption_tokens(images: DataFrame) -> DataFrame:
    """Caption-side of the multimodal pair: JVM-only token stats."""
    return images.select(
        "image_id",
        F.size(F.split(F.trim("caption"), " +")).alias("n_caption_tokens"),
        F.length("caption").alias("caption_chars"),
    )


# ---------------------------------------------------------------------------
# registered queries.  Pixel-decode paths are rows-only (the image table is
# engine-generated, not a DuckDB view; exact kernels are golden-tested in
# tests/test_streaming_multimodal.py).  Caption stats and the phash join are
# oracle-checked via lazy VALUES oracles built from the same deterministic
# fixture (see _fixture_pdf).
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


import functools


@functools.lru_cache(maxsize=1)
def _fixture_pdf():
    """The 48-image fixture materialized once, driver-side, for lazy oracles.

    The image table is engine-generated (not a DuckDB view), but every row is
    a deterministic function of the image index — so captions and phashes can
    be inlined as VALUES, turning the caption-stat and phash-join queries
    into full value-hash-checked oracles.  Lazy (registry callable) because
    the 48 encode/decode round-trips cost ~4 s — paid only when an oracle is
    actually requested, not at import.
    """
    from ..sources import images as img

    return img.generate_images_pandas(_N_IMG_QUERY)


def _caption_oracle() -> str:
    pdf = _fixture_pdf()
    vals = ", ".join(
        "('{}', '{}')".format(r.image_id, r.caption.replace("'", "''"))
        for r in pdf.itertuples()
    )
    return f"""
WITH caps(image_id, caption) AS (VALUES {vals})
SELECT image_id,
       CAST(len(string_split_regex(trim(caption), ' +')) AS INTEGER)
         AS n_caption_tokens,
       CAST(length(caption) AS INTEGER) AS caption_chars
FROM caps"""


@register("caption_token_stats", _caption_oracle)
def caption_token_stats(spark, sf_dir):
    """Caption-side token stats of the image+caption pair table (JVM-only)."""
    return caption_tokens(generate_images_df(spark, _N_IMG_QUERY))


def _phash_oracle() -> str:
    """Chunk-join + popcount refine over the fixture's (image_id, phash) rows.

    DuckDB's arithmetic ``>>`` equals Spark's ``shiftrightunsigned`` here
    because the ``& 65535`` mask keeps only bits the two shifts agree on.
    """
    pdf = _fixture_pdf()
    vals = ", ".join(
        f"('{r.image_id}', {int(r.phash)})" for r in pdf.itertuples()
    )
    return f"""
WITH imgs(image_id, phash) AS (VALUES {vals}),
chunks AS (
  SELECT image_id, phash, c.chunk, (phash >> (16 * c.chunk)) & 65535 AS cv
  FROM imgs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS chunk) c),
cand AS (
  SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
         a.phash AS ha, b.phash AS hb
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.cv = b.cv AND a.image_id < b.image_id)
SELECT img_a, img_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= 3"""


@register("phash_neardup_pairs", _phash_oracle)
def phash_neardup_pairs(spark, sf_dir):
    """Image near-dup pairs via 64-bit phash: banded 16-bit chunk join.

    The image twin of SimHash doc dedup — candidates share one of four
    16-bit phash chunks (hamming<=3 guarantees a clean chunk by pigeonhole),
    then exact ``bit_count`` refinement. Scales as an equi-join on the chunk
    key instead of an all-pairs scan.
    """
    # cache the 2-column projection: the self-join would otherwise run the
    # synth+encode+decode generation once per join side
    imgs = generate_images_df(spark, _N_IMG_QUERY).select("image_id", "phash").cache()
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
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        )
        .filter(F.col("hamming") <= 3)
        .select("img_a", "img_b", "hamming")
    )


@register("audio_features", None)  # deterministic fake-pcm16 twin; plumbing real
def audio_features(spark, sf_dir):
    """Audio-column plumbing: binary payload + typed metadata -> per-clip
    RMS / zero-crossing / peak features via mapInPandas."""
    return extract_audio_features(synth_audio_clips(spark, 16)).orderBy("clip_id")


def synth_y4m_clips(spark, n: int = 8, w: int = 32, h: int = 24, frames: int = 12) -> DataFrame:
    """Deterministic REAL-Y4M clip table (Cmono, distributed generation)."""
    from ..codecs.y4m import encode_y4m_mono

    def gen(batches):
        for pdf in batches:
            recs = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(3000 + i)
                stack = rng.integers(0, 256, size=(frames, h, w), dtype=np.uint8)
                recs.append(
                    {
                        "clip_id": f"y4m_{i:06d}",
                        "payload": encode_y4m_mono(stack),
                        "fmt": "y4m",
                        "w": w,
                        "h": h,
                    }
                )
            yield pd.DataFrame.from_records(recs)

    schema = "clip_id string, payload binary, fmt string, w int, h int"
    return spark.range(0, n, numPartitions=4).mapInPandas(gen, schema)


def _y4m_frame_oracle() -> str:
    """Driver-side NumPy reference over the same deterministic frame
    stacks (no container involved): equality proves the Y4M roundtrip and
    the distributed every-Nth sampling + per-clip aggregation."""
    rows = []
    for i in range(8):
        rng = np.random.default_rng(3000 + i)
        stack = rng.integers(0, 256, size=(12, 24, 32), dtype=np.uint8)
        sampled = stack[::2]
        means = [float(f.mean()) for f in sampled]
        rows.append(
            f"('y4m_{i:06d}', {len(sampled)}, {float(np.mean(means))!r}, "
            f"{len(sampled) * 24 * 32})"
        )
    return (
        "SELECT clip_id, n_sampled, ROUND(avg_frame_mean, 6) AS avg_frame_mean,"
        " total_bytes\n"
        "FROM (VALUES " + ", ".join(rows)
        + ") AS t(clip_id, n_sampled, avg_frame_mean, total_bytes)\n"
        "ORDER BY clip_id"
    )


@register("y4m_frame_sample", _y4m_frame_oracle)
def y4m_frame_sample(spark, sf_dir):
    """REAL video container end-to-end: YUV4MPEG2 clips frame-sampled
    (every 2nd) through the UDTF fan-out, aggregated per clip."""
    frames = sample_video_frames(synth_y4m_clips(spark, 8), every_n=2)
    return (
        frames.groupBy("clip_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.avg("frame_mean"), 6).alias("avg_frame_mean"),
            F.sum(F.length("frame_bytes")).alias("total_bytes"),
        )
        .orderBy("clip_id")
    )


def _wav_features_oracle() -> str:
    """Reference features computed driver-side from the SAME deterministic
    samples, quantized exactly as the encoder does — so equality proves the
    RIFF/WAVE container roundtrip (encode on generation, decode in the UDF)
    and the distributed feature pass, which the oracle does not replay."""
    rows = []
    for i in range(12):
        wave, rate, _channels = _wav_samples(i)
        q = np.clip(np.round(wave * 32768.0), -32768, 32767) / 32768.0
        x = q[:, 0] if q.shape[1] == 1 else q.mean(axis=1)
        rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
        zc = int(np.sum(np.abs(np.diff(np.signbit(x)))))
        peak = float(np.max(np.abs(x))) if len(x) else 0.0
        rows.append(
            f"('wav_{i:06d}', {rate}, {len(x)}, {rms!r}, {zc}, {peak!r})"
        )
    return (
        "SELECT clip_id, sample_rate, n_samples, rms, zero_crossings, peak\n"
        "FROM (VALUES " + ", ".join(rows)
        + ") AS t(clip_id, sample_rate, n_samples, rms, zero_crossings, peak)\n"
        "ORDER BY clip_id"
    )


@register("wav_audio_features", _wav_features_oracle)
def wav_audio_features(spark, sf_dir):
    """REAL audio container end-to-end: RIFF/WAVE PCM clips (mono+stereo,
    8/16 kHz) decoded by the spec-written codec inside the Arrow UDF."""
    return extract_audio_features(synth_wav_clips(spark, 12)).orderBy("clip_id")


@register("video_frame_sample", None)  # deterministic fake-rawgray twin
def video_frame_sample(spark, sf_dir):
    """Video-column plumbing: sample every 2nd frame (UDTF fan-out) and
    aggregate per-clip frame stats."""
    frames = sample_video_frames(synth_video_clips(spark, 8), every_n=2)
    return (
        frames.groupBy("clip_id")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.avg("frame_mean"), 6).alias("avg_frame_mean"),
            F.sum(F.length("frame_bytes")).alias("total_bytes"),
        )
        .orderBy("clip_id")
    )


@register(
    "image_size_profile",
    lambda: _image_size_profile_oracle(),
)
def image_size_profile(spark, sf_dir):
    """Metadata profile of the image table: per (fmt, orientation) counts,
    pixel totals, and dimension ranges — the curation-side scan that sizes
    decode budgets and flags aspect-ratio outliers before any pixel work.
    Pure JVM aggregation over the metadata columns — the scan itself is
    the metadata-only generator (``generate_images_meta_df``), so no
    pixel synthesis or codec work runs anywhere in this plan; the oracle
    recomputes the same rows from the deterministic dim/fmt cycles alone,
    cross-checking the table generator's metadata too.
    """
    from pyspark.sql import functions as F

    from ..sources.images import generate_images_meta_df

    imgs = generate_images_meta_df(spark, _N_IMG_QUERY)
    orient = (
        F.when(F.col("w") > F.col("h"), "landscape")
        .when(F.col("w") < F.col("h"), "portrait")
        .otherwise("square")
    )
    return (
        imgs.withColumn("orientation", orient)
        .groupBy("fmt", "orientation")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("w").cast("long") * F.col("h")).alias("n_px"),
            F.min("w").alias("w_min"),
            F.max("w").alias("w_max"),
            F.min("h").alias("h_min"),
            F.max("h").alias("h_max"),
        )
    )


def _image_size_profile_oracle() -> str:
    """Metadata-cycle VALUES oracle — no pixel generation, just the same
    deterministic (dims, fmt) functions the distributed generator uses."""
    from ..sources.images import image_dims, image_fmt

    vals = ", ".join(
        f"({w}, {h}, '{image_fmt(i)}')"
        for i, (w, h) in (
            (i, image_dims(i)) for i in range(_N_IMG_QUERY)
        )
    )
    return f"""
WITH imgs(w, h, fmt) AS (VALUES {vals})
SELECT fmt,
       CASE WHEN w > h THEN 'landscape'
            WHEN w < h THEN 'portrait' ELSE 'square' END AS orientation,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS n_px,
       MIN(w) AS w_min, MAX(w) AS w_max,
       MIN(h) AS h_min, MAX(h) AS h_max
FROM imgs GROUP BY fmt, orientation"""


# ---------------------------------------------------------------------------
# joint image+caption near-dup (multimodal dedup verdict)
# ---------------------------------------------------------------------------


def _joint_neardup_oracle() -> str:
    """Replays BOTH modality pipelines in SQL over the fixture VALUES —
    phash 16-bit chunk join + popcount refine, caption bigram-shingle join
    + exact Jaccard — and full-outer-joins the pair sets like the engine."""
    pdf = _fixture_pdf()
    vals = ", ".join(
        "({}, '{}', '{}')".format(
            int(r.phash), r.image_id, r.caption.replace("'", "''")
        )
        for r in pdf.itertuples()
    )
    return f"""
WITH imgs(phash, image_id, caption) AS (VALUES {vals}),
chunks AS (
  SELECT image_id, phash, c.chunk, (phash >> (16 * c.chunk)) & 65535 AS cv
  FROM imgs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS chunk) c),
ppairs AS (
  SELECT img_a, img_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
  FROM (SELECT DISTINCT a.image_id AS img_a, b.image_id AS img_b,
               a.phash AS ha, b.phash AS hb
        FROM chunks a JOIN chunks b
          ON a.chunk = b.chunk AND a.cv = b.cv AND a.image_id < b.image_id)
  WHERE bit_count(xor(ha, hb)) <= 3),
tok AS (
  SELECT image_id, string_split_regex(trim(caption), ' +') AS ts FROM imgs),
big AS (
  SELECT DISTINCT image_id, ts[i] || ' ' || ts[i + 1] AS bg
  FROM tok, unnest(range(1, len(ts))) AS t(i)),
sizes AS (SELECT image_id, COUNT(*) AS n FROM big GROUP BY image_id),
cpairs AS (
  SELECT a.image_id AS img_a, b.image_id AS img_b, COUNT(*) AS inter
  FROM big a JOIN big b ON a.bg = b.bg AND a.image_id < b.image_id
  GROUP BY 1, 2),
cj AS (
  SELECT img_a, img_b,
         ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
  FROM cpairs
  JOIN sizes sa ON sa.image_id = img_a
  JOIN sizes sb ON sb.image_id = img_b
  WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.3)
SELECT COALESCE(p.img_a, c.img_a) AS img_a,
       COALESCE(p.img_b, c.img_b) AS img_b,
       p.hamming, c.jaccard,
       CASE WHEN p.img_a IS NOT NULL AND c.img_a IS NOT NULL THEN 'both'
            WHEN p.img_a IS NOT NULL THEN 'image_only'
            ELSE 'caption_only' END AS verdict
FROM ppairs p FULL OUTER JOIN cj c
  ON p.img_a = c.img_a AND p.img_b = c.img_b"""


def joint_neardup(
    imgs: DataFrame, max_hamming: int = 3, min_jaccard: float = 0.3
) -> DataFrame:
    """Multimodal near-dup verdict: image pHash x caption shingles.

    ``imgs``: (image_id, phash, caption) rows.  Each modality generates
    candidates through its own bounded join — images via the 16-bit pHash
    pigeonhole chunk join (``max_hamming`` <= 3 guarantees one clean
    chunk), captions via a bigram-shingle equi-join with exact Jaccard
    (bigram document frequency is bounded by the per-band scene count, so
    the shingle key never goes hot the way unigrams like 'scene' would) —
    and a full outer join on the pair key merges them into one verdict
    row: 'both' / 'image_only' / 'caption_only'.  The cross-modality shape
    of CLIP-style corpus dedup: evidence from either side surfaces the
    pair, agreement upgrades it.
    """
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
    pa, pb = chunks.alias("a"), chunks.alias("b")
    ppairs = (
        pa.join(
            pb,
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
        .withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("img_a", "img_b", "hamming")
    )

    toks = F.split(F.trim("caption"), " +")
    big = (
        imgs.withColumn("ts", toks)
        .select(
            "image_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("ts") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("ts", i + 1), F.element_at("ts", i + 2)
                    ),
                )
            ).alias("bg"),
        )
        .distinct()
    )
    sizes = big.groupBy("image_id").agg(F.count("*").alias("n"))
    ba, bb = big.alias("a"), big.alias("b")
    cpairs = (
        ba.join(
            bb,
            (F.col("a.bg") == F.col("b.bg"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .groupBy(
            F.col("a.image_id").alias("img_a"), F.col("b.image_id").alias("img_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    cj = (
        # sizes is per-image (grows with the corpus): no forced broadcast —
        # AQE broadcasts when it measures small, shuffles otherwise
        cpairs.join(
            sizes.withColumnRenamed("image_id", "img_a")
            .withColumnRenamed("n", "na"), "img_a"
        )
        .join(
            sizes.withColumnRenamed("image_id", "img_b")
            .withColumnRenamed("n", "nb"), "img_b"
        )
        .withColumn(
            "jaccard_raw",
            F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard_raw") >= min_jaccard)
        .select("img_a", "img_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )

    joined = ppairs.alias("p").join(
        cj.alias("c"),
        (F.col("p.img_a") == F.col("c.img_a"))
        & (F.col("p.img_b") == F.col("c.img_b")),
        "full_outer",
    )
    return joined.select(
        F.coalesce(F.col("p.img_a"), F.col("c.img_a")).alias("img_a"),
        F.coalesce(F.col("p.img_b"), F.col("c.img_b")).alias("img_b"),
        F.col("p.hamming").alias("hamming"),
        F.col("c.jaccard").alias("jaccard"),
        F.when(
            F.col("p.img_a").isNotNull() & F.col("c.img_a").isNotNull(), "both"
        )
        .when(F.col("p.img_a").isNotNull(), "image_only")
        .otherwise("caption_only")
        .alias("verdict"),
    )


@register("joint_neardup_pairs", _joint_neardup_oracle)
def joint_neardup_pairs(spark, sf_dir):
    """Joint image+caption near-dup over the generated pair table (see
    ``joint_neardup``); the oracle replays both modality pipelines in SQL.
    The fixture yields image_only + caption_only rows; the 'both' branch
    is pinned by the crafted-pair test in tests/test_joint_neardup.py."""
    imgs = (
        generate_images_df(spark, _N_IMG_QUERY)
        .select("image_id", "phash", "caption")
        .cache()
    )
    return joint_neardup(imgs)
