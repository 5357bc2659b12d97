"""Hough line detection per tile — the linear-feature screen.

The classic Hough transform (Duda & Hart 1972): every edge pixel votes
for all (theta, rho) lines through it; accumulator peaks are linear
features.  In EO curation this is the ship-wake / road / runway / swath
-boundary screen — tiles whose dominant peak is strong are flagged for
the detection pipeline, and the peak's (theta, rho) is the feature's
pose.  Over a web image corpus it is the scanline/border-artifact
detector (synthetic images and screenshots produce extreme peaks).

Per tile: integer gradient magnitude ``|dx| + |dy| > T`` marks edge
pixels (exact int arithmetic, interior stencil — no halo needed), then
each votes across 16 angles with ``rho = floor(x cos t + y sin t +
0.5)`` and one flat ``bincount`` accumulates all (theta, rho) bins
vectorized (no Python loop over pixels).  The peak is argmax with
first-bin tie-break — deterministic.  Trig runs in NumPy on executors
AND in the driver replay (the ``solar`` libm-fidelity argument).

Scale shape: one map-only ``mapInPandas`` over the tile scan, zero
shuffle, output one row per tile — the cheapest possible plan at 10^12
tiles; a cross-tile line stitcher would be a groupBy over (var, theta,
rho-of-global-frame), deliberately out of scope here.  Oracle:
direct-kernel replay VALUES (the ``mosaic_fp`` pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from ..codecs import decode_image
from .focal import TILE_PX
from .registry import register

N_IMG = 24
EDGE_T = 2000  # |dx|+|dy| on the u16 mosaic (~4k edge px per 256^2 tile)
N_THETA = 16  # angle bins over [0, pi)
RHO_OFF = 256  # rho in [-256, 362] for 256^2 tiles -> offset to >= 0
RSPAN = 640  # accumulator rho span per angle


def hough_features(tile: np.ndarray) -> tuple[int, int, int, int]:
    """(n_edges, peak_theta, peak_rho, peak_votes) of one tile."""
    t = tile.astype(np.int64)
    gx = np.abs(t[1:-1, 2:] - t[1:-1, :-2])
    gy = np.abs(t[2:, 1:-1] - t[:-2, 1:-1])
    ys, xs = np.nonzero(gx + gy > EDGE_T)
    if xs.size == 0:
        return 0, 0, 0, 0
    xs, ys = (xs + 1).astype(np.float64), (ys + 1).astype(np.float64)
    theta = np.arange(N_THETA) * (np.pi / N_THETA)
    rho = np.floor(
        xs[:, None] * np.cos(theta)[None, :]
        + ys[:, None] * np.sin(theta)[None, :]
        + 0.5
    ).astype(np.int64)
    keys = (np.arange(N_THETA)[None, :] * RSPAN + rho + RHO_OFF).ravel()
    acc = np.bincount(keys, minlength=N_THETA * RSPAN)
    best = int(np.argmax(acc))  # first max = smallest bin: deterministic
    return (
        int(xs.size),
        best // RSPAN,
        best % RSPAN - RHO_OFF,
        int(acc[best]),
    )


def hough_tiles(tiles: DataFrame) -> DataFrame:
    import pandas as pd

    def kern(batches):
        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                t = decode_image(row.data, "raw-u16", TILE_PX, TILE_PX)
                n, ti, r, v = hough_features(t)
                recs.append(
                    {
                        "var": row.var,
                        "tile_x": int(row.tile_x),
                        "tile_y": int(row.tile_y),
                        "n_edges": n,
                        "peak_theta": ti,
                        "peak_rho": r,
                        "peak_votes": v,
                    }
                )
            cols = [
                "var", "tile_x", "tile_y",
                "n_edges", "peak_theta", "peak_rho", "peak_votes",
            ]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return tiles.select("var", "tile_x", "tile_y", "data").mapInPandas(
        kern,
        "var string, tile_x long, tile_y long, n_edges long, "
        "peak_theta long, peak_rho long, peak_votes long",
    )


def _hough_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var, tx, ty in sorted(cv):
        n, ti, r, v = hough_features(cv[(var, tx, ty)])
        rows.append((var, tx, ty, n, ti, r, v))
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_edges", "BIGINT"),
            ("peak_theta", "BIGINT"),
            ("peak_rho", "BIGINT"),
            ("peak_votes", "BIGINT"),
        ],
        rows,
    )


@register("hough_peak_fp", _hough_oracle)
def hough_peak_fp(spark, sf_dir):
    """Dominant Hough line peak of every merged-mosaic tile —
    hash-checked against the sequential direct-kernel replay."""
    from .hydrology import _merged_tiles

    return hough_tiles(_merged_tiles(spark))
