"""Cross-level pyramid audit: constructed goldens + replay parity."""

import numpy as np

from data_model_spark.operators import replay
from data_model_spark.operators.pyramid_audit import (
    _audit_stats,
    audit_replay,
    pyramid_audit,
)


def _tile_row(var, level, tx, ty, arr):
    return {
        "var": var, "level": level, "tile_x": tx, "tile_y": ty,
        "data": arr.astype(">u2").tobytes(),
    }


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "var string, level int, tile_x long, tile_y long, data binary"
    )


def _exact_parent(children):
    """uint16 parent == the reflectance block mean of the 512^2 mosaic."""
    C = np.zeros((512, 512), np.int64)
    for (cx, cy), t in children.items():
        C[(1 - cy) * 256 : (2 - cy) * 256, cx * 256 : (cx + 1) * 256] = t
    return (
        C.reshape(256, 2, 256, 2).sum(axis=(1, 3)) / 4.0
    ).astype(np.uint16)


def test_consistent_parent_fully_exact():
    rng = np.random.default_rng(31)
    kids = {
        (cx, cy): rng.integers(0, 65536, (256, 256), dtype=np.uint16)
        for cx in (0, 1) for cy in (0, 1)
    }
    # make every 2x2 block sum divisible by 4 so the float mean is exact
    for t in kids.values():
        t &= np.uint16(0xFFFC)
    hp, nc, ne, nw, mx, sd = _audit_stats("b02", _exact_parent(kids), kids)
    assert (hp, nc, ne, mx, sd) == (1, 4, 65536, 0, 0)


def test_corrupted_pixel_detected():
    kids = {(cx, cy): np.full((256, 256), 400, np.uint16)
            for cx in (0, 1) for cy in (0, 1)}
    P = _exact_parent(kids)
    P[17, 40] += 7
    hp, nc, ne, nw, mx, sd = _audit_stats("b02", P, kids)
    assert (ne, nw, mx, sd) == (65535, 65535, 7, 7)


def test_orphans_and_missing_children():
    k = {(0, 0): np.full((256, 256), 100, np.uint16)}
    hp, nc, ne, nw, mx, sd = _audit_stats("b02", None, k)
    assert (hp, nc) == (0, 1)
    assert sd == 100 * 256 * 256 // 4  # quarter mosaic vs zero parent
    hp, nc, ne, nw, mx, sd = _audit_stats("b02", np.zeros((256, 256), np.uint16), {})
    assert (hp, nc, ne, sd) == (1, 0, 65536, 0)


def test_classification_uses_center_pick():
    # scl dispatches to center-pick, not mean: children constant 9 ->
    # expected parent is 9 even though the mean of {9, 0} edges differs
    kids = {(cx, cy): np.full((256, 256), 9, np.uint16)
            for cx in (0, 1) for cy in (0, 1)}
    P = np.full((256, 256), 9, np.uint16)
    hp, nc, ne, nw, mx, sd = _audit_stats("scl", P, kids)
    assert (ne, sd) == (65536, 0)


def test_level0_replay_matches_legacy():
    a = replay.merged_canvases_at(8, 0)
    b = replay.merged_canvases(8)
    assert set(a) == set(b)
    assert all(np.array_equal(a[k], b[k]) for k in a)


def test_distributed_matches_replay(spark):
    from pyspark.sql import functions as F

    from data_model_spark.operators import tiling
    from data_model_spark.sources.images import generate_images_df

    tiles = tiling.merge_tiles(
        tiling.build_tiles(generate_images_df(spark, 8), repartition=False)
    ).filter(F.col("level") <= 1)
    got = sorted(
        (r.var, r.ptile_x, r.ptile_y, r.has_parent, r.n_child,
         r.n_exact, r.n_within1, r.maxad, r.sad)
        for r in pyramid_audit(tiles).collect()
    )
    assert got == audit_replay(8)


def test_published_pyramid_is_self_consistent():
    # the engine's own 24-scene pyramid: every stored parent reproduces
    # bit-exactly from its children; orphan groups are exactly the
    # sub-min-dimension scenes (children with no stored overview)
    rows = audit_replay(24)
    with_parent = [r for r in rows if r[3] == 1]
    assert with_parent and all(r[5] == 65536 for r in with_parent)
    assert all(r[4] >= 1 for r in (r for r in rows if r[3] == 0))
