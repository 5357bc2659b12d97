"""Scene co-registration: integer-shift recovery by exact global
cross-correlation over the tile mosaic.

The classic pre-processing step before multi-temporal compositing /
change detection: two acquisitions of the same footprint are misaligned
by a small rigid translation (platform jitter, orbit drift), and the
pipeline must estimate the integer pixel shift that aligns the moving
layer to the reference before any per-pixel operator (``band_ndi``,
``change_detect``, temporal median) is meaningful.  The reference's
reprojection path assumes registered inputs (GCP warp,
``src/eopf_geozarr/conversion/geozarr.py``); this operator supplies the
registration estimate itself, phase-correlation style but with EXACT
integer arithmetic so the result is bit-identical at any parallelism.

Distributed design (100 TB shape):

* ONE halo exchange at radius ``pad = max_shift + |planted|`` — the same
  O(perimeter) edge-strip shuffle as ``focal_stats`` (strips are
  ``pad/256`` of the tile volume, ~6% at pad=7+4);
* per tile, a vectorized NumPy kernel computes the (2S+1)^2 candidate
  correlation partials from the padded canvas — embarrassingly parallel,
  no further pixel movement;
* one map-side-combinable ``sum`` over the (var, dy, dx)-keyed partials
  — (2S+1)^2 rows per var in flight, nothing scales with pixel count
  after the kernel;
* partials are exact int64 (max 65535^2 * 256^2 < 2^48); the global
  reduction runs in DECIMAL(38,0) (overflow-proof at any tile count) and
  the result is emitted as BIGINT — exact while the global score stays
  below 2^63, i.e. up to ~32k stored tiles per var at full 16-bit range,
  far above the fixture; oracle transport must be integer because DuckDB
  both parses DOUBLE literals 1 ULP off shortest-roundtrip repr and
  converts DECIMAL(38,0) to float64 in ``.df()``.

The moving layer is derived deterministically INSIDE the kernel as the
``planted``-lag resample of the stored mosaic (zeros outside stored
tiles, exactly the halo canvas semantics), so the fixture plants a known
misregistration and the estimator must recover the aligning lag.  The
peak is provably at the aligning lag: with M[p] = A0[p + L0] the score
at candidate d is sum_p A0[p] * A0[p + L0 + d] over the zero-padded
mosaic A0, and by Cauchy-Schwarz sum A0[p]*A0[p+L] <= sum A0[p]^2 with
equality only at L = 0 (the mosaic is not shift-periodic), so
argmax_d score = -L0.

Oracle: driver-side NumPy replay over ``replay.merged_canvases`` — the
zero-padded bounding-rectangle var mosaic reproduces the halo canvases
exactly (halo radius < TILE_PX, so only the 8 stored neighbors can
reach a window; proven hash-equal by the zonal_stats_fp lineage), and
the identical kernel yields int64-identical VALUES rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .focal import TILE_PX, halo_exchange
from .registry import register

MAX_SHIFT = 4  # candidate search window: dy, dx in [-4 .. 4]
PLANTED = (3, -2)  # planted misregistration lag (rows southward, cols east)
N_IMG = 24  # same fixed mosaic as the hydrology/threshold suites


def shift_scores_kernel(
    canvas: np.ndarray, pad: int, max_shift: int, planted: tuple[int, int]
) -> list[int]:
    """(2S+1)^2 exact int64 correlation partials of one padded tile.

    ``canvas``: (TILE_PX + 2*pad)^2 int64, zeros outside the stored
    mosaic.  Row-major over (dy, dx): index (dy+S)*(2S+1) + (dx+S) holds
    sum(R * C[pad+py+dy : ..., pad+px+dx : ...]) with (py, px) the
    planted lag — the reference tile against the moving layer sampled at
    candidate lag d.
    """
    n = TILE_PX
    py, px = planted
    ref = canvas[pad : pad + n, pad : pad + n]
    out: list[int] = []
    for dy in range(-max_shift, max_shift + 1):
        r0 = pad + py + dy
        for dx in range(-max_shift, max_shift + 1):
            c0 = pad + px + dx
            out.append(int(np.sum(ref * canvas[r0 : r0 + n, c0 : c0 + n])))
    return out


def shift_correlation(
    tiles: DataFrame,
    max_shift: int = MAX_SHIFT,
    planted: tuple[int, int] = PLANTED,
) -> DataFrame:
    """(var, dy, dx, score) exact global correlation surface per var.

    ``tiles``: the merged level-0 tile table (var, level, tile_x, tile_y,
    data).  One halo shuffle + one combinable aggregation; the caller
    reads off ``argmax score`` per var as the recovered aligning lag.
    """
    s = max_shift
    pad = s + max(abs(planted[0]), abs(planted[1]))
    w = 2 * s + 1

    def compute(P: np.ndarray, n_halo: int) -> dict:
        return {"scores": shift_scores_kernel(P, pad, s, planted)}

    per_tile = halo_exchange(
        tiles,
        radius=pad,
        compute=compute,
        out_fields=[T.StructField("scores", T.ArrayType(T.LongType()))],
    )
    return (
        per_tile.select("var", F.posexplode("scores").alias("idx", "partial"))
        .groupBy(
            "var",
            F.expr(f"CAST(idx DIV {w} AS BIGINT) - {s}").alias("dy"),
            F.expr(f"CAST(idx % {w} AS BIGINT) - {s}").alias("dx"),
        )
        .agg(
            F.sum(F.col("partial").cast("decimal(38,0)"))
            .cast("long")
            .alias("score")
        )
    )


def best_shift(scores: DataFrame) -> DataFrame:
    """(var, dy, dx) argmax row per var — the recovered aligning lag
    (deterministic: scores are exact, ties broken by (dy, dx))."""
    best = scores.groupBy("var").agg(
        F.max(F.struct("score", "dy", "dx")).alias("m")
    )
    return best.select("var", "m.dy", "m.dx")


def _coregister_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    s = MAX_SHIFT
    pad = s + max(abs(PLANTED[0]), abs(PLANTED[1]))
    w = 2 * s + 1
    cv = replay.merged_canvases(N_IMG)
    acc: dict[tuple, int] = {}
    for var in replay.mosaic_vars(cv):
        G, tiles, origin = replay.var_mosaic(cv, var)
        Gp = np.pad(G.astype(np.int64), pad)
        for tx, ty in tiles:
            tx_min, ty_max = origin
            r0, c0 = (ty_max - ty) * TILE_PX, (tx - tx_min) * TILE_PX
            window = Gp[
                r0 : r0 + TILE_PX + 2 * pad, c0 : c0 + TILE_PX + 2 * pad
            ]
            parts = shift_scores_kernel(window, pad, s, PLANTED)
            for i, v in enumerate(parts):
                key = (var, i // w - s, i % w - s)
                acc[key] = acc.get(key, 0) + v
    rows = [(var, dy, dx, sc) for (var, dy, dx), sc in sorted(acc.items())]
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("dy", "BIGINT"),
            ("dx", "BIGINT"),
            ("score", "BIGINT"),
        ],
        rows,
    )


@register("coregister_shift", _coregister_oracle)
def coregister_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-var exact correlation surface of the planted (3, -2)
    misregistration over the 24-image merged mosaic — the argmax row per
    var recovers the aligning lag (-3, 2); the oracle replays the same
    kernel on the zero-padded global mosaics."""
    from .hydrology import _merged_tiles

    return shift_correlation(_merged_tiles(spark))
