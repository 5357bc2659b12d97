"""Cloud-shadow projection: cast the cloud mask along the sun vector
and confirm against dark pixels.

The standard cloud-shadow matching move (Fmask-style): a pixel is a
shadow CANDIDATE if the cloud mask, displaced by the sun-geometry
offset (the shadow of the cloud at its assumed height), covers it; it
is CONFIRMED shadow if it is also dark.  Scene-level QA masks
(cloud + shadow) gate every downstream composite.  The displacement is
one scene-wide integer vector — the same sun illuminates every band —
so the operator is a pure stencil:

* ONE radius-``PAD`` halo exchange (the focal/terrain edge-strip
  shuffle) brings the neighbor pixels a displaced mask can reach;
* per tile, boolean arithmetic on the padded canvas: cloud
  (>= T_CLOUD), predicted shadow (cloud at p - d), confirmed
  (predicted AND core <= T_DARK) — all integer-exact, bit-identical
  at any parallelism.

Oracle: sequential replay on the identical padded canvases
(``replay.padded`` radius-1 generalized via the global-mosaic window,
the ``coregister`` pattern) — VALUES rows with per-tile counts and a
positional checksum of the confirmed mask.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .focal import TILE_PX, halo_exchange
from .registry import register
from .upsample import _CK_MOD, _CK_MUL

N_IMG = 24
T_CLOUD = 3500  # bright threshold over the 0..5000 mosaic domain
T_DARK = 800  # confirmable-shadow darkness ceiling
SHIFT = (3, -2)  # (dy, dx): shadow cast 3 px south, 2 px west of the cloud
PAD = 4


def shadow_kernel(canvas: np.ndarray, pad: int) -> dict:
    """Counts + checksum of the shadow masks of one padded tile."""
    n = canvas.shape[0] - 2 * pad
    core = canvas[pad : pad + n, pad : pad + n]
    dy, dx = SHIFT
    # shadow at p comes from a cloud at p - d (sampled via the halo)
    src = canvas[pad - dy : pad - dy + n, pad - dx : pad - dx + n]
    cloud = core >= T_CLOUD
    pred = src >= T_CLOUD
    conf = pred & (core <= T_DARK)
    flat = conf.ravel().astype(np.int64)
    idx = np.arange(flat.size, dtype=np.int64)
    ck = int((flat * ((idx * _CK_MUL) % _CK_MOD)).sum())
    return {
        "n_cloud": int(cloud.sum()),
        "n_pred": int(pred.sum()),
        "n_conf": int(conf.sum()),
        "ck": ck,
    }


_OUT_FIELDS = [
    T.StructField("n_cloud", T.LongType()),
    T.StructField("n_pred", T.LongType()),
    T.StructField("n_conf", T.LongType()),
    T.StructField("ck", T.LongType()),
]


def shadow_tiles(tiles: DataFrame) -> DataFrame:
    def compute(P: np.ndarray, n_halo: int) -> dict:
        return shadow_kernel(P, PAD)

    return halo_exchange(tiles, radius=PAD, compute=compute, out_fields=_OUT_FIELDS)


def _shadow_oracle() -> str:
    from . import replay
    from .mosaic_fp import _values_sql

    cv = replay.merged_canvases(N_IMG)
    rows = []
    for var in replay.mosaic_vars(cv):
        G, tiles, origin = replay.var_mosaic(cv, var)
        Gp = np.pad(G.astype(np.int64), PAD)
        tx_min, ty_max = origin
        for tx, ty in sorted(tiles):
            r0, c0 = (ty_max - ty) * TILE_PX, (tx - tx_min) * TILE_PX
            win = Gp[r0 : r0 + TILE_PX + 2 * PAD, c0 : c0 + TILE_PX + 2 * PAD]
            fp = shadow_kernel(win, PAD)
            rows.append(
                (var, tx, ty, fp["n_cloud"], fp["n_pred"], fp["n_conf"], fp["ck"])
            )
    return _values_sql(
        [
            ("var", "VARCHAR"),
            ("tile_x", "BIGINT"),
            ("tile_y", "BIGINT"),
            ("n_cloud", "BIGINT"),
            ("n_pred", "BIGINT"),
            ("n_conf", "BIGINT"),
            ("ck", "BIGINT"),
        ],
        rows,
    )


@register("shadow_mask_fp", _shadow_oracle)
def shadow_mask_fp(spark, sf_dir):
    """Cloud/predicted-shadow/confirmed-shadow masks of the merged
    mosaic under the (3, -2) sun displacement — hash-checked against the
    padded-global-mosaic replay."""
    from .hydrology import _merged_tiles

    out = shadow_tiles(_merged_tiles(spark))
    return out.select("var", "tile_x", "tile_y", "n_cloud", "n_pred", "n_conf", "ck")
