"""Type-aware block downsampling — the engine's aggregation core.

Two execution paths with identical semantics (SURVEY.md §2.4):

1. **Production path** — NumPy kernels applied per image/tile inside Arrow
   pandas UDFs (``mapInPandas``): reshape-based block reductions, zero
   per-row Python.  Semantics reimplemented from the reference's documented
   behavior (``conversion/utils.py:70-132``, ``s2_optimization/
   s2_resampling.py:11-203``): crop-to-divisible then reduce (never pad),
   nodata-aware means, NaN means, center-pixel classification picks,
   any-nonzero quality-mask OR, clamped probability means, strided subsample
   fallback when a block dimension is <= 1.

2. **Oracle path** — the same reductions as Spark ``groupBy`` expressions
   over tall ``(y, x, value)`` data, used for DuckDB-checkable parity
   (``__spark_entry__.queries()``) and for cases where data is already
   relational.

Variable-type dispatch matches the reference's band-name rules
(``s2_resampling.py:172-203``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# NumPy kernels (production path)
# ---------------------------------------------------------------------------


def _crop_divisible(arr: np.ndarray, th: int, tw: int) -> tuple[np.ndarray, int, int]:
    h, w = arr.shape[-2:]
    bh, bw = h // th, w // tw
    return arr[..., : th * bh, : tw * bw], bh, bw


def block_mean(
    arr: np.ndarray, th: int, tw: int, nodata: float | None = None
) -> np.ndarray:
    """Block-average downsample with nodata handling (A1/A2/A3/A4).

    * no nodata        -> plain block mean
    * numeric nodata   -> mean over valid pixels; all-invalid block -> nodata
    * NaN nodata       -> nanmean per block
    * block dim <= 1   -> strided subsample via linspace indices
    """
    h, w = arr.shape[-2:]
    bh, bw = h // th, w // tw
    if bh <= 1 or bw <= 1:
        return subsample(arr, th, tw)
    cropped, bh, bw = _crop_divisible(arr, th, tw)
    shaped = cropped.reshape(*cropped.shape[:-2], th, bh, tw, bw)
    ax = (-3, -1)
    if nodata is None:
        return shaped.mean(axis=ax)
    if np.isnan(nodata):
        with np.errstate(invalid="ignore"):
            return np.nanmean(shaped, axis=ax)
    valid = shaped != nodata
    vsum = np.where(valid, shaped, 0).astype(np.float64).sum(axis=ax)
    vcnt = valid.sum(axis=ax)
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(vcnt > 0, vsum / np.maximum(vcnt, 1), nodata)


def subsample(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Strided index selection (the block<=1 fallback, A4)."""
    h, w = arr.shape[-2:]
    yi = np.linspace(0, h - 1, th, dtype=int)
    xi = np.linspace(0, w - 1, tw, dtype=int)
    return arr[..., yi, :][..., xi]


def block_sum_count(
    arr: np.ndarray, th: int, tw: int, nodata: float | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """(sum, count) pair per block — the exact-cascade carry (A15).

    Mean-of-means is only exact for equal block sizes; carrying (sum, count)
    through cascaded pyramid levels keeps every level exact under uneven
    blocks.
    """
    cropped, bh, bw = _crop_divisible(arr, th, tw)
    shaped = cropped.reshape(*cropped.shape[:-2], th, bh, tw, bw)
    ax = (-3, -1)
    if nodata is None:
        valid = np.ones_like(shaped, dtype=bool)
    elif np.isnan(nodata):
        valid = ~np.isnan(shaped)
    else:
        valid = shaped != nodata
    vsum = np.where(valid, shaped, 0).astype(np.float64).sum(axis=ax)
    vcnt = valid.sum(axis=ax).astype(np.int64)
    return vsum, vcnt


def classification_pick(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Center-pixel nearest-neighbor downsample for classification data (A6)."""
    cropped, bh, bw = _crop_divisible(arr, th, tw)
    cy, cx = bh // 2, bw // 2
    out = cropped[..., cy::bh, cx::bw]
    return out[..., :th, :tw]


def quality_mask_or(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Logical-OR downsample: any nonzero pixel marks the block (A7)."""
    cropped, bh, bw = _crop_divisible(arr, th, tw)
    shaped = cropped.reshape(*cropped.shape[:-2], th, bh, tw, bw)
    return (shaped.sum(axis=(-3, -1)) > 0).astype(arr.dtype)


def probability_mean(arr: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Mean then clamp to the observed probability range [0,1] or [0,100] (A8)."""
    out = block_mean(arr, th, tw)
    hi = 1.0 if out.max() <= 1.0 else 100.0
    return np.clip(out, 0, hi)


def gcp_dedup_mean(
    line: np.ndarray, pixel: np.ndarray, values: np.ndarray, factor: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Overview-GCP computation (A11): scale+round line/pixel, group, mean.

    ``values`` is (N, K); returns (line', pixel', means (M, K)).
    """
    lk = np.round(line / factor).astype(np.int64)
    pk = np.round(pixel / factor).astype(np.int64)
    keys = np.stack([lk, pk], axis=1)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    sums = np.zeros((uniq.shape[0], values.shape[1]))
    np.add.at(sums, inv, values)
    counts = np.bincount(inv, minlength=uniq.shape[0]).astype(np.float64)
    return uniq[:, 0], uniq[:, 1], sums / counts[:, None]


VARIABLE_KERNELS = {
    "reflectance": block_mean,
    "classification": classification_pick,
    "quality_mask": quality_mask_or,
    "probability": probability_mean,
}


def variable_type(var_name: str) -> str:
    """Band-name -> reduction-type dispatch (same rules as the reference)."""
    n = var_name
    if n.startswith("b") and (n[1:].isdigit() or n == "b8a"):
        return "reflectance"
    if n == "scl":
        return "classification"
    if n in ("cld", "snw"):
        return "probability"
    if n in ("aot", "wvp"):
        return "reflectance"
    if n.startswith(("detector_footprint_", "quality_")):
        return "quality_mask"
    return "reflectance"


def downsample(arr: np.ndarray, th: int, tw: int, var_name: str = "b02") -> np.ndarray:
    """Dispatching downsample; preserves the input dtype like the reference."""
    kern = VARIABLE_KERNELS[variable_type(var_name)]
    return np.asarray(kern(arr, th, tw)).astype(arr.dtype)


# ---------------------------------------------------------------------------
# Spark grouped-agg twins (oracle path, tall (key..., y, x, value) data)
# ---------------------------------------------------------------------------


def _block_keys(block_y: int, block_x: int) -> list[Column]:
    return [
        (F.col("y") / block_y).cast("int").alias("blk_y"),
        (F.col("x") / block_x).cast("int").alias("blk_x"),
    ]


def sql_block_mean(df: DataFrame, block: int, value_col: str = "value") -> DataFrame:
    """groupBy block mean over tall pixels — Catalyst partial+final avg."""
    return (
        df.groupBy(*_block_keys(block, block))
        .agg(F.avg(value_col).alias("mean_value"))
    )


def sql_nodata_mean(
    df: DataFrame, block: int, nodata: float, value_col: str = "value"
) -> DataFrame:
    v = F.col(value_col)
    valid = F.when(v != F.lit(nodata), v)
    return df.groupBy(*_block_keys(block, block)).agg(
        F.coalesce(F.avg(valid), F.lit(float(nodata))).alias("mean_value")
    )


def sql_mask_or(df: DataFrame, block: int, value_col: str = "value") -> DataFrame:
    return df.groupBy(*_block_keys(block, block)).agg(
        (F.sum(value_col) > 0).cast("int").alias("mask")
    )


def sql_center_pick(df: DataFrame, block: int, value_col: str = "value") -> DataFrame:
    """Center-pixel pick as a filter — no shuffle at all (vs window rank)."""
    c = block // 2
    return df.filter(
        (F.col("y") % block == c) & (F.col("x") % block == c)
    ).select(
        (F.col("y") / block).cast("int").alias("blk_y"),
        (F.col("x") / block).cast("int").alias("blk_x"),
        F.col(value_col).alias("picked"),
    )


def sql_probability_mean(
    df: DataFrame, block: int, hi: float, value_col: str = "value"
) -> DataFrame:
    return df.groupBy(*_block_keys(block, block)).agg(
        F.least(F.greatest(F.avg(value_col), F.lit(0.0)), F.lit(float(hi))).alias(
            "mean_value"
        )
    )
