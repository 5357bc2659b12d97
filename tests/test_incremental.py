"""Cell-set algebra (compact/boundary) + incremental dirty-tile planning.

Each distributed operator is proven against an independent NumPy reference
on the same input; dirty_tiles is additionally proven against the pixel
path (build_tiles) — the metadata plan must name exactly the tiles the
real tiling job would write.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_model_spark.functions import cells
from data_model_spark.operators import spatial, tiling
from data_model_spark.sources.images import generate_images_df, generate_images_meta_df
from data_model_spark.sources.tables import local_df


# ---------------------------------------------------------------------------
# compact_cover: NumPy reference properties
# ---------------------------------------------------------------------------


def test_compact_roundtrip_bbox():
    cover = cells.bbox_cover(10.0, 46.0, 11.3, 47.1, 13)
    comp = cells.compact_cover(cover, min_res=9)
    # strictly smaller and mixed-resolution
    assert len(comp) < len(cover)
    assert len(set(cells.cell_res(comp))) > 1
    # exact roundtrip: expansion reproduces the original set
    back = cells.uncompact_cover(comp, 13)
    assert np.array_equal(np.sort(back), np.unique(cover))


def test_compact_roundtrip_with_hole():
    cover = set(int(c) for c in cells.bbox_cover(10.0, 46.0, 10.5, 46.5, 12))
    hole = set(int(c) for c in cells.bbox_cover(10.2, 46.2, 10.25, 46.25, 12))
    mask = np.array(sorted(cover - hole), dtype=np.int64)
    comp = cells.compact_cover(mask, min_res=8)
    back = cells.uncompact_cover(comp, 12)
    assert np.array_equal(back, mask)


def test_compact_idempotent_on_sparse():
    # no complete quad -> compaction is the identity
    sparse = cells.cell_id(10, np.array([0, 2, 4, 6]), np.array([0, 2, 4, 6]))
    comp = cells.compact_cover(sparse, min_res=5)
    assert np.array_equal(np.sort(comp), np.sort(sparse))


def test_compact_full_quad_tree_collapses_to_one():
    # a full 2^k x 2^k aligned block collapses to a single coarse cell
    xs, ys = np.meshgrid(np.arange(8, 16), np.arange(24, 32))
    cover = cells.cell_id(10, xs.ravel(), ys.ravel())
    comp = cells.compact_cover(cover, min_res=7)
    assert comp.tolist() == [int(cells.cell_id(7, 1, 3))]


# ---------------------------------------------------------------------------
# distributed twins == NumPy reference
# ---------------------------------------------------------------------------


def test_compact_cover_df_matches_numpy(spark):
    cover = set(int(c) for c in cells.bbox_cover(10.0, 46.0, 11.0, 46.8, 12))
    hole = set(int(c) for c in cells.bbox_cover(10.4, 46.3, 10.45, 46.35, 12))
    mask = np.array(sorted(cover - hole), dtype=np.int64)
    df = local_df(spark, [("m", int(c)) for c in mask], "poly_id string, cell long")
    got = sorted(
        r.cell
        for r in spatial.compact_cover_df(df, res=12, min_res=8).collect()
    )
    want = sorted(int(c) for c in cells.compact_cover(mask, min_res=8))
    assert got == want


def test_compact_cover_df_per_id_isolation(spark):
    # two ids sharing cell coordinates must compact independently
    quad = cells.cell_id(6, np.array([4, 5, 4, 5]), np.array([8, 8, 9, 9]))
    rows = [("a", int(c)) for c in quad] + [("b", int(quad[0]))]
    df = local_df(spark, rows, "poly_id string, cell long")
    got = {(r.poly_id, r.cell) for r in spatial.compact_cover_df(df, 6, 5).collect()}
    assert got == {("a", int(cells.cell_id(5, 2, 4))), ("b", int(quad[0]))}


def test_mask_boundary_numpy_square_with_hole():
    xs, ys = np.meshgrid(np.arange(10, 20), np.arange(30, 40))
    mask = set(int(c) for c in cells.cell_id(8, xs.ravel(), ys.ravel()))
    hole = int(cells.cell_id(8, 15, 35))
    mask.discard(hole)
    m = np.array(sorted(mask), dtype=np.int64)
    bnd = set(int(c) for c in cells.mask_boundary(m, 8))
    # outer perimeter: 10x10 square minus interior 8x8 = 36 cells,
    # plus the 4 rook neighbors of the hole
    outer = {
        int(cells.cell_id(8, x, y))
        for x in range(10, 20)
        for y in range(30, 40)
        if x in (10, 19) or y in (30, 39)
    }
    hole_edge = {
        int(cells.cell_id(8, x, y))
        for x, y in [(14, 35), (16, 35), (15, 34), (15, 36)]
    }
    assert bnd == outer | hole_edge


def test_mask_boundary_wrap_and_clamp():
    res = 4  # n = 16
    n = 1 << res
    # full lon band at y = 0: wraps in x (no x-boundary), lat edge south
    band = cells.cell_id(res, np.arange(n), np.zeros(n, dtype=np.int64))
    bnd = cells.mask_boundary(band, res)
    # y-1 is off-grid and y+1 absent -> every cell is boundary
    assert np.array_equal(np.sort(bnd), np.sort(band))
    # two stacked bands: y=0 row still boundary (off-grid south), y=1 too
    both = np.concatenate(
        [band, cells.cell_id(res, np.arange(n), np.ones(n, dtype=np.int64))]
    )
    assert len(cells.mask_boundary(both, res)) == 2 * n
    # three stacked bands: middle row is interior (wrap covers east/west)
    three = np.concatenate(
        [both, cells.cell_id(res, np.arange(n), np.full(n, 2, dtype=np.int64))]
    )
    bnd3 = set(int(c) for c in cells.mask_boundary(three, res))
    middle = set(int(c) for c in cells.cell_id(res, np.arange(n), np.ones(n, dtype=np.int64)))
    assert bnd3.isdisjoint(middle)


def test_mask_boundary_cells_df_matches_numpy(spark):
    xs, ys = np.meshgrid(np.arange(100, 112), np.arange(200, 210))
    mask = set(int(c) for c in cells.cell_id(9, xs.ravel(), ys.ravel()))
    for h in [(105, 204), (106, 204), (105, 205), (110, 208)]:
        mask.discard(int(cells.cell_id(9, *h)))
    m = np.array(sorted(mask), dtype=np.int64)
    df = local_df(spark, [(int(c),) for c in m], "cell long")
    got = sorted(r.cell for r in spatial.mask_boundary_cells(df, res=9).collect())
    want = sorted(int(c) for c in cells.mask_boundary(m, 9))
    assert got == want


# ---------------------------------------------------------------------------
# dirty_tiles == pixel-path truth
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pick", [lambda i: i % 7 == 0, lambda i: i in (1, 2, 44)])
def test_dirty_tiles_match_build_tiles(spark, pick):
    n = 48
    meta = generate_images_meta_df(spark, n)
    idx = F.split("image_id", "_").getItem(1).cast("long")
    picked = [i for i in range(n) if pick(i)]
    changed_meta = meta.filter(idx.isin(picked))
    planned = {
        (r.level, r.tile_x, r.tile_y)
        for r in tiling.dirty_tiles(changed_meta).collect()
    }
    images = generate_images_df(spark, n).filter(
        F.split("image_id", "_").getItem(1).cast("long").isin(picked)
    )
    actual = {
        (r.level, r.tile_x, r.tile_y)
        for r in tiling.build_tiles(images, min_dimension=64, repartition=False)
        .select("level", "tile_x", "tile_y")
        .distinct()
        .collect()
    }
    assert planned == actual


def test_dirty_tiles_scene_counts(spark):
    # vertically adjacent scenes (i, i+64) share columns: at coarse levels
    # their tile ranges overlap -> n_scenes > 1 must occur
    meta = generate_images_meta_df(spark, 96)
    changed = meta.filter(
        F.pmod(F.split("image_id", "_").getItem(1).cast("long"), F.lit(7)) == 0
    )
    rows = tiling.dirty_tiles(changed).collect()
    assert sum(r.n_scenes for r in rows) >= len(rows)
    assert max(r.n_scenes for r in rows) > 1
