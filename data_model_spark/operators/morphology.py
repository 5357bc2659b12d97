"""Binary mask morphology over the tiled mosaic: dilation, erosion,
gradient, and two-stage opening — the cloud-mask buffering primitives.

Sentinel-2 L2A pipelines dilate the scene-classification cloud mask
before compositing (the reference's quality-mask OR kernel,
`src/eopf_geozarr/conversion/geozarr.py` A7 family, consumes exactly
such masks); erosion/opening remove salt noise from water or snow
masks.  Here the mask is ``pixel >= threshold`` over the merged global
tile table and the structuring element a (2r+1)^2 box.

Scale design:

* **Dilate / erode / gradient are ONE halo exchange**
  (``focal.halo_exchange``): each tile ships only r-pixel edge strips to
  its 8 neighbors — ~3% shuffle overhead at r=1 — and the kernel is a
  vectorized window max/min over the padded int64 canvas.
* **Opening chains two exchanges**: the erode pass emits the eroded
  mask as a canvas column, and a second halo exchange dilates it —
  2 bounded shuffles total, each O(data), never a global gather.  The
  missing-neighbor convention (zeros outside the stored mosaic) is
  closed under both passes, so chaining stays exact at mosaic edges.
* All counts are exact integers; the driver-checked oracle twins replay
  the identical kernels on the identical 1-px padded canvases
  (``replay.padded``), so a hash match proves the distributed strip
  routing, not just the NumPy.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .focal import halo_exchange
from .tiling import TILE_PX

#: mask threshold for the registered queries: reflectance bands
#: (500..5000-ish with a smooth wave) split roughly in half — masks have
#: real spatial structure; class/probability bands (scl/cld/snw <= 100)
#: mask empty and pin the zero-propagation path
MASK_THRESHOLD = 2500


def _win(P: np.ndarray, r: int) -> np.ndarray:
    return np.lib.stride_tricks.sliding_window_view(P, (2 * r + 1, 2 * r + 1))


def morph_counts(P: np.ndarray, r: int, threshold: int):
    """Exact (dilated_px, eroded_px, gradient_px, eroded mask) of one
    padded canvas — shared verbatim with the oracle replay."""
    mask = (P >= threshold).astype(np.uint8)
    w = _win(mask, r)
    dil = w.max(axis=(2, 3))
    ero = w.min(axis=(2, 3))
    return (
        int(dil.sum()),
        int(ero.sum()),
        int((dil & (1 - ero)).sum()),
        ero.astype(np.uint16),
    )


_GRAD_FIELDS = [
    T.StructField("dilated_px", T.LongType(), False),
    T.StructField("eroded_px", T.LongType(), False),
    T.StructField("gradient_px", T.LongType(), False),
]

_ERODE_FIELDS = _GRAD_FIELDS + [T.StructField("data", T.BinaryType(), False)]

_OPEN_FIELDS = [T.StructField("opened_px", T.LongType(), False)]


def morph_stats(tiles: DataFrame, radius: int = 1,
                threshold: int = MASK_THRESHOLD,
                keep_canvas: bool = False) -> DataFrame:
    """Per-tile dilation/erosion/gradient pixel counts of the threshold
    mask (one halo exchange).  ``keep_canvas=True`` additionally carries
    the eroded mask canvas for chaining (``morph_opening``)."""

    def compute(P: np.ndarray, n_halo: int) -> dict:
        d, e, g, ero = morph_counts(P, radius, threshold)
        rec = {"dilated_px": d, "eroded_px": e, "gradient_px": g}
        if keep_canvas:
            rec["data"] = np.ascontiguousarray(ero).tobytes()
        return rec

    fields = _ERODE_FIELDS if keep_canvas else _GRAD_FIELDS
    return halo_exchange(tiles, radius, compute, fields)


def morph_opening(tiles: DataFrame, radius: int = 1,
                  threshold: int = MASK_THRESHOLD) -> DataFrame:
    """Morphological opening (erode then dilate): ONE fused halo exchange
    at radius ``2*radius``.  Output counts the opened mask per tile — the
    salt-noise-free mask a snow/water product would keep.

    Fusion equivalence with the former erode-exchange -> dilate-exchange
    chain: erosion at a position 1 px inside a stored neighbor reads mask
    values at most ``2*radius`` px away — all inside the widened halo —
    and a MISSING neighbor contributed zero strips to the second
    exchange, which equals eroding the zero-filled halo (min of zeros is
    zero).  Same bits, one shuffle instead of two."""

    def opened(P: np.ndarray, n_halo: int) -> dict:
        mask = (P >= threshold).astype(np.uint8)
        ero = _win(mask, radius).min(axis=(2, 3))  # (TILE+2r)^2
        dil = _win(ero, radius).max(axis=(2, 3))  # TILE^2 interior
        return {"opened_px": int(dil.sum())}

    return halo_exchange(tiles, 2 * radius, opened, _OPEN_FIELDS)


def _morph_opening_two_pass(tiles: DataFrame, radius: int = 1,
                            threshold: int = MASK_THRESHOLD) -> DataFrame:
    """The pre-fusion erode-exchange -> dilate-exchange chain, kept for
    the equivalence pin in tests/test_morphology.py."""
    eroded = morph_stats(
        tiles, radius=radius, threshold=threshold, keep_canvas=True
    ).select("var", "level", "tile_x", "tile_y", "data")

    def dilate(P: np.ndarray, n_halo: int) -> dict:
        # the eroded canvases are already 0/1 — threshold at 1
        w = _win((P >= 1).astype(np.uint8), radius)
        return {"opened_px": int(w.max(axis=(2, 3)).sum())}

    return halo_exchange(eroded, radius, dilate, _OPEN_FIELDS)


# ---------------------------------------------------------------------------
# registered oracle-twin queries (sequential padded-canvas replay)
# ---------------------------------------------------------------------------

from . import replay  # noqa: E402
from .mosaic_fp import _values_sql  # noqa: E402
from .registry import register  # noqa: E402

_MORPH_N = 48  # the focal/hillshade halo fixture size


def _merged_tiles(spark):
    from pyspark.sql import functions as F

    from ..sources.images import generate_images_df
    from . import tiling

    images = generate_images_df(spark, _MORPH_N)
    return tiling.merge_tiles(
        tiling.build_tiles(images, repartition=False)
    ).filter(F.col("level") == 0)


def _grad_oracle() -> str:
    cv = replay.merged_canvases(_MORPH_N)
    rows = []
    for var, tx, ty in sorted(cv):
        d, e, g, _ = morph_counts(replay.padded(cv, var, tx, ty), 1, MASK_THRESHOLD)
        rows.append((var, tx, ty, replay.n_halo(cv, var, tx, ty), d, e, g))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_halo", "INTEGER"),
            ("dilated_px", "BIGINT"),
            ("eroded_px", "BIGINT"),
            ("gradient_px", "BIGINT"),
        ],
        rows,
    )


@register("morph_gradient_fp", _grad_oracle)
def morph_gradient_fp(spark, sf_dir):
    """Mask dilate/erode/gradient counts over the 48-scene halo fixture —
    one halo exchange, kernel-replay hash-checked."""
    return morph_stats(_merged_tiles(spark)).select(
        "var", "tile_x", "tile_y", "n_halo",
        "dilated_px", "eroded_px", "gradient_px",
    )


def _open_oracle() -> str:
    cv = replay.merged_canvases(_MORPH_N)
    eroded = {
        k: morph_counts(replay.padded(cv, *k), 1, MASK_THRESHOLD)[3]
        for k in cv
    }
    rows = []
    for var, tx, ty in sorted(eroded):
        P = replay.padded(eroded, var, tx, ty)
        w = _win((P >= 1).astype(np.uint8), 1)
        rows.append((var, tx, ty, int(w.max(axis=(2, 3)).sum())))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("opened_px", "BIGINT"),
        ],
        rows,
    )


@register("morph_open_fp", _open_oracle)
def morph_open_fp(spark, sf_dir):
    """Morphological opening over the same fixture — one fused
    double-radius halo exchange; a hash match (against the two-pass
    replay) proves the fusion conserves the chained-exchange bits."""
    return morph_opening(_merged_tiles(spark)).select(
        "var", "tile_x", "tile_y", "opened_px"
    )
