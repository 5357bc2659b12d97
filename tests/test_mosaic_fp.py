"""Replay-helper tests for the mosaic fingerprint oracle twins.

The twins' end-to-end Spark-vs-DuckDB equality is the driver's (and
scripts/parity_check.py's) job; these tests pin the sequential replay
building blocks themselves: halo assembly vs the global mosaic, the
union-find stitch vs the global union-find truth, and the Spark
``F.round`` HALF_UP replay.  No SparkSession needed.
"""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.mosaic_fp import _r, _region_fragments


def test_padded_equals_global_mosaic_slice():
    # the per-tile 1-px padded canvas (stored-neighbor strips, zeros
    # elsewhere) must equal the corresponding slice of the zero-padded
    # ranged global mosaic — gaps are zero-filled there, which is
    # exactly the absent-neighbor halo contract
    cv = replay.merged_canvases(24)
    n = replay.TILE_PX
    for var in replay.mosaic_vars(cv):
        G, tiles, origin = replay.var_mosaic(cv, var)
        P_G = np.pad(G.astype(np.int64), 1)
        tx_min, ty_max = origin
        for tx, ty in tiles:
            r0 = (ty_max - ty) * n
            c0 = (tx - tx_min) * n
            want = P_G[r0 : r0 + n + 2, c0 : c0 + n + 2]
            got = replay.padded(cv, var, tx, ty)
            assert np.array_equal(got, want), (var, tx, ty)


def test_region_fragments_match_global_union_find():
    # stitched fragment groups must reproduce the global per-var
    # union-find truth: same region pixel-count multiset, and fragment
    # pixel counts must sum to their region's count
    from data_model_spark.operators.ccl import reference_regions

    cv = replay.merged_canvases(24)
    got = sorted(
        sum(s[0] for s in frags) for frags in _region_fragments(1500).values()
    )
    want = []
    for var in replay.mosaic_vars(cv):
        G, _, _ = replay.var_mosaic(cv, var)
        want.extend(reference_regions(G, 1500))
    assert got == sorted(want)


def test_region_bbox_inside_tile_extents():
    cv = replay.merged_canvases(24)
    n = replay.TILE_PX
    ext = {}
    for var, tx, ty in cv:
        lo_x, hi_x, lo_y, hi_y = ext.get(var, (1 << 60, -1, 1 << 60, -1))
        ext[var] = (
            min(lo_x, tx * n), max(hi_x, (tx + 1) * n - 1),
            min(lo_y, ty * n), max(hi_y, (ty + 1) * n - 1),
        )
    lo_x = min(e[0] for e in ext.values())
    hi_x = max(e[1] for e in ext.values())
    lo_y = min(e[2] for e in ext.values())
    hi_y = max(e[3] for e in ext.values())
    for frags in _region_fragments(1500).values():
        px = sum(s[0] for s in frags)
        assert px > 0
        assert lo_x <= min(s[1] for s in frags) <= max(s[2] for s in frags) <= hi_x
        assert lo_y <= min(s[3] for s in frags) <= max(s[4] for s in frags) <= hi_y


def test_round_replay_is_half_up_on_shortest_repr():
    # Spark's Round(double, 3) = BigDecimal of Double.toString digits,
    # HALF_UP; Python's repr gives the same shortest round-trip digits
    assert _r(2.0005, 3) == 2.001  # exact-binary value is just below the
    # midpoint, but its shortest repr IS "2.0005" -> rounds up like Spark
    assert _r(1.23449, 3) == 1.234
    assert _r(0.0, 3) == 0.0
    assert _r(7.12, 3) == 7.12
