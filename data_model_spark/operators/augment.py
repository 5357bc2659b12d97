"""Vision-training data ops over the image table: deterministic
augmentation, ViT patch extraction, CutMix pair synthesis.

These run the REAL image path of the input contract — decode the
``bytes`` column (raw-u16 / png / jpeg codecs), transform pixels in
Arrow-batched NumPy, emit exact integer fingerprints — the per-image
work a 10^12-image vision-training pipeline does between storage and
the data loader:

* ``augment_fp`` — the standard geometric augmentation chain (hflip if
  ``i % 2``, rot90 by ``i % 4``, center-crop to a multiple of 8),
  fingerprinted by the position-weighted pixel sum
  ``sum v[r,c] * (r * W_out + c)`` — any orientation or crop error
  moves it.  Pure per-row work: ZERO shuffles besides the scan.
* ``vit_patches_fp`` — 16x16 patch grid (crop to multiples of 16,
  reshape): per image the patch count, the count of INFORMATIVE patches
  (exact integer patch-variance test ``p^2*ss - s^2 > T*p^4``, the
  quadtree split test at patch granularity — how ViT pipelines drop
  blank sky/sea patches), and the patch-position-weighted sum of patch
  sums.  Also shuffle-free.
* ``cutmix_fp`` — CutMix (Yun et al., ICCV 2019) with deterministic
  geometry: image i receives a box of image ``(i+1) % n`` (both decoded
  from their REAL bytes), lambda reported as the exact pixel-count
  microfraction.  The pair assembly is a REAL self-join of the image
  table on the derived partner index — at corpus scale this is the one
  shuffle (hash on partner id); here AQE broadcasts the 48-row side.

Fingerprint magnitudes (why int64 suffices): v <= ~5000 (reflectance
cap), dims <= 512, so ``sum v*(r*W+c) <= 5000 * (512^2)^2 / 2 ~ 1.7e14``.

Oracle: sequential replay VALUES over the fixed 48-image fixture —
the replay decodes ``encode(synth_pixels(i))`` exactly as the table
generator does, so the driver hash match proves the decode + transform
+ join plumbing end to end (the ``zonal_stats_fp`` evidence pattern).

Reference context: the reference's only pixel transforms are
downsampling (``s2_optimization/s2_resampling.py``); augmentation /
patching / mixing extend the same decode-transform-fingerprint shape to
the training-side ops its corpus consumers need.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

N_IMG = 48
PATCH = 16
PATCH_VAR_T = 20_000  # informative-patch population-variance threshold
_MICRO = 1_000_000


def _decoded(i: int) -> np.ndarray:
    from ..codecs import decode_image, encode_image
    from ..sources import images as img

    w, h = img.image_dims(i)
    fmt = img.image_fmt(i)
    raw = img.synth_pixels(f"img_{i:012d}", w, h)
    return decode_image(encode_image(raw, fmt), fmt, w, h)


def _wsum(a: np.ndarray) -> int:
    h, w = a.shape
    idx = np.arange(h * w, dtype=np.int64)
    return int((a.astype(np.int64).ravel() * idx).sum())


# ---------------------------------------------------------------------------
# augmentation chain
# ---------------------------------------------------------------------------


def augment_np(pixels: np.ndarray, i: int) -> np.ndarray:
    """hflip if i odd -> rot90 by (i % 4) -> center-crop to /8 dims."""
    a = pixels[:, ::-1] if i % 2 else pixels
    a = np.rot90(a, k=i % 4)
    h, w = a.shape
    ch, cw = (h // 8) * 8, (w // 8) * 8
    r0, c0 = (h - ch) // 2, (w - cw) // 2
    return a[r0 : r0 + ch, c0 : c0 + cw]


def augment_stats(images: DataFrame) -> DataFrame:
    """(image_id, out_h, out_w, px_sum, wsum) after the chain."""
    from ..codecs import decode_image
    from ..sources.images import image_index

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = decode_image(r.bytes, r.fmt, r.w, r.h)
                out = augment_np(a, image_index(r.image_id))
                rows.append(
                    (r.image_id, out.shape[0], out.shape[1],
                     int(out.astype(np.int64).sum()), _wsum(out))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "out_h", "out_w", "px_sum", "wsum"],
                )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel,
        "image_id string, out_h bigint, out_w bigint,"
        " px_sum bigint, wsum bigint",
    )


def _augment_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for i in range(N_IMG):
        out = augment_np(_decoded(i), i)
        rows.append(
            (f"img_{i:012d}", out.shape[0], out.shape[1],
             int(out.astype(np.int64).sum()), _wsum(out))
        )
    return _values_sql(
        [("image_id", "VARCHAR"), ("out_h", "BIGINT"), ("out_w", "BIGINT"),
         ("px_sum", "BIGINT"), ("wsum", "BIGINT")],
        rows,
    )


@register("augment_fp", _augment_oracle)
def augment_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic augmentation chain over the 48-image fixture,
    decoded from real bytes; fingerprints vs the sequential replay."""
    from ..sources.images import generate_images_df

    return augment_stats(generate_images_df(spark, N_IMG))


# ---------------------------------------------------------------------------
# ViT patch extraction
# ---------------------------------------------------------------------------


def patch_stats_np(pixels: np.ndarray) -> tuple[int, int, int, int]:
    """(n_patches, informative, px_sum, patch_wsum) on the /16 crop."""
    h, w = pixels.shape
    ch, cw = (h // PATCH) * PATCH, (w // PATCH) * PATCH
    a = pixels[:ch, :cw].astype(np.int64)
    gh, gw = ch // PATCH, cw // PATCH
    blocks = a.reshape(gh, PATCH, gw, PATCH)
    s = blocks.sum(axis=(1, 3))
    ss = (blocks * blocks).sum(axis=(1, 3))
    n = PATCH * PATCH
    informative = int((n * ss - s * s > PATCH_VAR_T * n * n).sum())
    idx = np.arange(gh * gw, dtype=np.int64)
    return (
        gh * gw,
        informative,
        int(a.sum()),
        int((s.ravel() * idx).sum()),
    )


def vit_patch_stats(images: DataFrame) -> DataFrame:
    from ..codecs import decode_image

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = decode_image(r.bytes, r.fmt, r.w, r.h)
                rows.append((r.image_id, *patch_stats_np(a)))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "n_patches", "informative",
                             "px_sum", "patch_wsum"],
                )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel,
        "image_id string, n_patches bigint, informative bigint,"
        " px_sum bigint, patch_wsum bigint",
    )


def _patches_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = [
        (f"img_{i:012d}", *patch_stats_np(_decoded(i))) for i in range(N_IMG)
    ]
    return _values_sql(
        [("image_id", "VARCHAR"), ("n_patches", "BIGINT"),
         ("informative", "BIGINT"), ("px_sum", "BIGINT"),
         ("patch_wsum", "BIGINT")],
        rows,
    )


@register("vit_patches_fp", _patches_oracle)
def vit_patches_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16x16 patch-grid stats (count, informative-patch count by the
    exact variance test, weighted sums) over real decoded bytes."""
    from ..sources.images import generate_images_df

    return vit_patch_stats(generate_images_df(spark, N_IMG))


# ---------------------------------------------------------------------------
# CutMix pair synthesis
# ---------------------------------------------------------------------------


def cutmix_box(i: int, oh: int, ow: int) -> tuple[int, int, int, int]:
    """Deterministic paste box inside the (oh, ow) overlap region."""
    bx0 = (i * 37) % max(ow - 32, 1)
    by0 = (i * 59) % max(oh - 32, 1)
    bw = min(32 + (i * 17) % 64, ow - bx0)
    bh = min(32 + (i * 23) % 64, oh - by0)
    return by0, bx0, bh, bw


def cutmix_np(a: np.ndarray, b: np.ndarray, i: int):
    """Paste b's box into a copy of a; returns (mixed, lambda_micro)."""
    oh, ow = min(a.shape[0], b.shape[0]), min(a.shape[1], b.shape[1])
    by0, bx0, bh, bw = cutmix_box(i, oh, ow)
    out = a.copy()
    out[by0 : by0 + bh, bx0 : bx0 + bw] = b[by0 : by0 + bh, bx0 : bx0 + bw]
    lam = _MICRO - (bh * bw * _MICRO) // (a.shape[0] * a.shape[1])
    return out, int(lam)


def cutmix_stats(images: DataFrame, n: int) -> DataFrame:
    """Self-join image i with partner (i+1) % n, mix, fingerprint.
    The join key is pure arithmetic on image_id — one hash shuffle at
    corpus scale, broadcast here."""
    from ..codecs import decode_image
    from ..sources.images import image_index

    a = images.select(
        F.col("image_id").alias("a_id"),
        F.col("bytes").alias("a_bytes"),
        F.col("fmt").alias("a_fmt"),
        F.col("w").alias("a_w"),
        F.col("h").alias("a_h"),
        F.pmod(
            F.substring("image_id", 5, 12).cast("long") + 1, F.lit(n)
        ).alias("partner"),
    )
    b = images.select(
        F.substring("image_id", 5, 12).cast("long").alias("partner"),
        F.col("bytes").alias("b_bytes"),
        F.col("fmt").alias("b_fmt"),
        F.col("w").alias("b_w"),
        F.col("h").alias("b_h"),
    )
    j = a.join(b, "partner")

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                i = image_index(r.a_id)
                pa = decode_image(r.a_bytes, r.a_fmt, r.a_w, r.a_h)
                pb = decode_image(r.b_bytes, r.b_fmt, r.b_w, r.b_h)
                mixed, lam = cutmix_np(pa, pb, i)
                rows.append(
                    (r.a_id, lam, int(mixed.astype(np.int64).sum()),
                     _wsum(mixed))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "lambda_micro", "px_sum", "wsum"],
                )

    return j.mapInPandas(
        kernel,
        "image_id string, lambda_micro bigint, px_sum bigint, wsum bigint",
    )


def _cutmix_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for i in range(N_IMG):
        mixed, lam = cutmix_np(_decoded(i), _decoded((i + 1) % N_IMG), i)
        rows.append(
            (f"img_{i:012d}", lam, int(mixed.astype(np.int64).sum()),
             _wsum(mixed))
        )
    return _values_sql(
        [("image_id", "VARCHAR"), ("lambda_micro", "BIGINT"),
         ("px_sum", "BIGINT"), ("wsum", "BIGINT")],
        rows,
    )


@register("cutmix_fp", _cutmix_oracle)
def cutmix_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CutMix over the 48-image fixture: real-bytes self-join on the
    derived partner index, exact lambda microfraction + mixed-pixel
    fingerprints vs the sequential replay."""
    from ..sources.images import generate_images_df

    return cutmix_stats(generate_images_df(spark, N_IMG), N_IMG)
