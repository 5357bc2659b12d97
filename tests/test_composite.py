"""Temporal median composite + feathered blend: kernel exactness,
fixture non-vacuity, and parallelism invariance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image, encode_image
from data_model_spark.operators import composite, replay, tiling
from data_model_spark.operators.composite import (
    feather_blend,
    feather_weights,
    median_composite,
    median_fingerprint,
)
from data_model_spark.sources import images as img_src
from data_model_spark.sources.images import generate_images_df

TILE_PX = tiling.TILE_PX


def _frag_rows(blocks):
    """Build TILE_SCHEMA rows for hand-placed blocks on one tile:
    [(image_id, oy, ox, uint16 block)]."""
    rows = []
    for image_id, oy, ox, b in blocks:
        rows.append(
            {
                "image_id": image_id,
                "var": "b02",
                "level": 0,
                "tile_x": 0,
                "tile_y": 0,
                "off_x": int(ox),
                "off_y": int(oy),
                "tile_w": int(b.shape[1]),
                "tile_h": int(b.shape[0]),
                "data": encode_image(b.astype(np.uint16), "raw-u16"),
                "px_sum": float(b.sum()),
                "px_cnt": int(b.size),
                "px_min": float(b.min()),
                "px_max": float(b.max()),
            }
        )
    return rows


def test_median_depth3_exact(spark):
    """Three fully-overlapping blocks: the composite is the TRUE per-pixel
    median (odd depth — not the two-value average the 96-scene fixture
    exercises)."""
    rng = np.random.default_rng(7)
    blocks = [rng.integers(0, 5000, (64, 64)).astype(np.uint16) for _ in range(3)]
    rows = _frag_rows([(f"img_{k:012d}", 8, 16, b) for k, b in enumerate(blocks)])
    frags = spark.createDataFrame(rows, schema=tiling.TILE_SCHEMA)
    out = median_composite(frags).collect()
    assert len(out) == 1
    t = out[0]
    med = np.median(np.stack(blocks), axis=0)  # odd depth: element-exact
    assert t.max_depth == 3 and t.n_frags == 3
    assert t.obs_px == 64 * 64 and t.obs_total == 3 * 64 * 64
    assert t.med2_sum == int(2 * med.astype(np.int64).sum())
    canvas = decode_image(t.data, "raw-u16", TILE_PX, TILE_PX)
    assert np.array_equal(canvas[8:72, 16:80], med.astype(np.uint16))


def test_median_even_depth_is_midpair_mean():
    """Even depth: med2 = lo + hi of the middle pair, exactly."""
    a = np.array([[10, 20]], dtype=np.uint16)
    b = np.array([[30, 21]], dtype=np.uint16)
    obs_px, obs_total, kmax, med2, canvas = median_fingerprint(
        [(0, 0, a), (0, 0, b)]
    )
    assert (obs_px, obs_total, kmax) == (2, 4, 2)
    assert med2 == (10 + 30) + (20 + 21)
    assert canvas[0, 0] == 20 and canvas[0, 1] == 20  # floor((20+21)/2)


def test_median_single_scene_identity(spark):
    """Depth-1 composite == the scene itself (med2 = 2 * value)."""
    b = np.arange(64 * 64, dtype=np.uint16).reshape(64, 64) % 4000
    frags = spark.createDataFrame(
        _frag_rows([("img_000000000000", 0, 0, b)]), schema=tiling.TILE_SCHEMA
    )
    t = median_composite(frags).collect()[0]
    assert t.med2_sum == 2 * int(b.astype(np.int64).sum())
    assert t.max_depth == 1 and t.obs_px == b.size


def test_fixture_overlap_nonvacuous():
    """The 96-scene fixture actually stacks scenes: depth 2 somewhere."""
    stacks = composite._frag_stacks(composite._COMPOSITE_N)
    depths = [median_fingerprint(s)[2] for s in stacks.values()]
    assert max(depths) >= 2
    overlap_tiles = sum(d >= 2 for d in depths)
    assert overlap_tiles >= 10  # not a single boundary accident


def test_median_parallelism_invariance(spark):
    """Same figures at 1 and 7 shuffle partitions (integer sums are
    order-free; the stream grouping must not depend on partitioning)."""
    images = generate_images_df(spark, 32)
    frags = tiling.build_tiles(images, repartition=False).filter(
        F.col("level") == 0
    )

    def run():
        return {
            (r.var, r.tile_x, r.tile_y): (r.n_frags, r.obs_px, r.med2_sum)
            for r in median_composite(frags).collect()
        }

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        r1 = run()
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        r7 = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r1 == r7 and len(r1) > 0


def test_feather_weights_properties():
    """Weights: >= 1 everywhere, 1 on scene borders, symmetric under the
    scene's 180-degree rotation."""
    i = 4  # (256, 256) scene
    w, h = img_src.image_dims(i)
    ax, ay = img_src.scene_anchor(i)
    # anchors are pixel-aligned, not tile-aligned: derive the (tile,
    # offset) frame whose fragment origin is the scene's NW corner
    ax_px = round(ax / img_src.PIXEL_SIZE_M)
    top_px = round(ay / img_src.PIXEL_SIZE_M) + h
    tx, off_x = divmod(ax_px, TILE_PX)
    ty = (top_px - 1) // TILE_PX
    off_y = (ty + 1) * TILE_PX - top_px
    wts = feather_weights(i, tx, ty, off_x, off_y, w, h)
    assert wts.min() == 1
    assert wts[0].max() == 1 and wts[-1].max() == 1
    assert wts[:, 0].max() == 1 and wts[:, -1].max() == 1
    assert np.array_equal(wts, wts[::-1, ::-1])
    assert wts.max() == min(w, h) // 2


def test_blend_single_source_identity(spark):
    """One scene: blended value == scene value exactly (num = w*v, den = w
    pixelwise), so num_sum/den_sum figures reduce to direct sums."""
    images = generate_images_df(spark, 8)
    frags = tiling.build_tiles(images, repartition=False).filter(
        F.col("level") == 0
    )
    out = {
        (r.var, r.tile_x, r.tile_y): r for r in feather_blend(frags).collect()
    }
    # replay one tile directly
    for i, var, tx, ty, oy, ox, block in replay.placements(8, with_index=True):
        t = out[(var, tx, ty)]
        wts = feather_weights(i, tx, ty, ox, oy, block.shape[1], block.shape[0])
        if t.n_frags == 1:
            assert t.num_sum == int((wts * block.astype(np.int64)).sum())
            assert t.den_sum == int(wts.sum())
            assert t.covered_px == block.size


def test_blend_rejects_pyramid_levels(spark):
    images = generate_images_df(spark, 8)  # includes a 256x256 scene -> level 1
    frags = tiling.build_tiles(images, repartition=False).filter(
        F.col("level") == 1
    )
    assert frags.count() > 0
    with pytest.raises(Exception, match="level-0"):
        feather_blend(frags).collect()


def test_trend_kernel_goldens():
    """Hand-built stacks: rising, falling, flat, and depth-1 pixels."""
    from data_model_spark.operators.composite import trend_fingerprint

    up = np.array([[10]], dtype=np.uint16)
    mid = np.array([[20]], dtype=np.uint16)
    top = np.array([[30]], dtype=np.uint16)
    # rising series at t=0,1,2: numerator 3*sum(tv) - sum(t)*sum(v)
    trend_px, pos, neg, num = trend_fingerprint(
        [(0, 0, 0, up), (1, 0, 0, mid), (2, 0, 0, top)]
    )
    assert (trend_px, pos, neg) == (1, 1, 0)
    assert num == 3 * (0 * 10 + 1 * 20 + 2 * 30) - 3 * 60  # = 60
    # falling
    _, pos, neg, num = trend_fingerprint(
        [(0, 0, 0, top), (1, 0, 0, mid), (2, 0, 0, up)]
    )
    assert (pos, neg) == (0, 1) and num == -60
    # flat -> numerator 0, counted in trend_px but neither pos nor neg
    t, pos, neg, num = trend_fingerprint([(3, 0, 0, mid), (9, 0, 0, mid)])
    assert (t, pos, neg, num) == (1, 0, 0, 0)
    # depth-1 pixels are not trend pixels
    t, pos, neg, num = trend_fingerprint([(5, 0, 0, mid)])
    assert (t, pos, neg, num) == (0, 0, 0, 0)


def test_trend_fixture_nonvacuous(spark):
    """The 96-scene fixture produces real rising AND falling pixels."""
    from data_model_spark.operators.composite import temporal_trend

    rows = temporal_trend(_fixture_frags(spark)).collect()
    assert sum(r.pos_trend_px for r in rows) > 0
    assert sum(r.neg_trend_px for r in rows) > 0
    assert sum(r.trend_px for r in rows) > 1000


def _fixture_frags(spark):
    images = generate_images_df(spark, 96)
    return tiling.build_tiles(images, repartition=False).filter(
        F.col("level") == 0
    )
