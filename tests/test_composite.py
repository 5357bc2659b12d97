"""Revision catalog resolution + temporal composite exactness."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.codecs import decode_image
from data_model_spark.operators import tiling
from data_model_spark.sources import images as img_src
from data_model_spark.sources.images import (
    generate_images_df,
    generate_revision_df,
    revision_id,
)
from data_model_spark.sources.tables import local_df


def _ids(df):
    return sorted(r.image_id for r in df.select("image_id").collect())


class TestLatestRevision:
    def test_numeric_not_lexicographic(self, spark):
        ids = [revision_id(5, r) for r in (None, 1, 2, 10)]
        df = local_df(spark, [(i,) for i in ids], "image_id string")
        out = _ids(tiling.latest_revision(df))
        assert out == [revision_id(5, 10)]  # r10 > r2 numerically

    def test_one_row_per_scene(self, spark):
        rows = [(revision_id(i, r),) for i in range(6) for r in (None, 1)]
        df = local_df(spark, rows, "image_id string")
        out = _ids(tiling.latest_revision(df))
        assert out == [revision_id(i, 1) for i in range(6)]

    def test_unrevised_passthrough(self, spark):
        base = generate_images_df(spark, 4)
        out = tiling.latest_revision(base)
        assert _ids(out) == _ids(base)
        assert out.columns == base.columns

    def test_revision_rows_share_footprint(self, spark):
        revs = generate_revision_df(spark, [0, 3], rev=2)
        for r in revs.collect():
            i = img_src.image_index(r.image_id)
            assert i in (0, 3)
            assert (r.w, r.h) == img_src.image_dims(i)
            # content differs from the original scene
            orig = img_src.synth_pixels(revision_id(i, None), r.w, r.h)
            new = img_src.synth_pixels(r.image_id, r.w, r.h)
            assert not np.array_equal(orig, new)


class TestComposite:
    def test_canvas_is_winner_pixels(self, spark):
        """The merged canvas of a revised scene's anchor tile equals the
        revision's own pixels — not the original's."""
        base = generate_images_df(spark, 2)
        revs = generate_revision_df(spark, [0], rev=1)
        latest = tiling.latest_revision(base.unionByName(revs))
        merged = tiling.merge_tiles(
            tiling.build_tiles(latest, repartition=False)
        ).filter(F.col("level") == 0)
        i = 0
        w, h = img_src.image_dims(i)
        ax, ay = img_src.scene_anchor(i)
        tile_m = tiling.TILE_PX * img_src.PIXEL_SIZE_M
        tx, ty = int(ax // tile_m), int(ay // tile_m)
        row = merged.filter(
            (F.col("tile_x") == tx) & (F.col("tile_y") == ty)
            & (F.col("var") == img_src.band_for(i))
        ).collect()[0]
        canvas = decode_image(row.data, "raw-u16", tiling.TILE_PX, tiling.TILE_PX)
        win = img_src.synth_pixels(revision_id(i, 1), w, h)
        # scene sits mid-tile: offsets from the tile's NW corner
        r0 = int(((ty + 1) * tile_m - (ay + h * img_src.PIXEL_SIZE_M))
                 // img_src.PIXEL_SIZE_M)
        c0 = int((ax - tx * tile_m) // img_src.PIXEL_SIZE_M)
        block = canvas[r0 : r0 + h, c0 : c0 + w]
        assert np.array_equal(block, win)

    def test_prefilter_equals_lastwrite(self, spark):
        """Filtering to the latest revision BEFORE the cut produces the
        same merged canvases as compositing all revisions with the
        id-ordered last-write-wins merge (full-coverage revisions)."""
        base = generate_images_df(spark, 3)
        revs = generate_revision_df(spark, [0, 1, 2], rev=1)
        both = base.unionByName(revs)
        a = tiling.merge_tiles(
            tiling.build_tiles(tiling.latest_revision(both), repartition=False)
        )
        b = tiling.merge_tiles(tiling.build_tiles(both, repartition=False))
        am = {(r.var, r.level, r.tile_x, r.tile_y): r.data for r in a.collect()}
        bm = {(r.var, r.level, r.tile_x, r.tile_y): r.data for r in b.collect()}
        assert set(am) == set(bm)
        for k in am:
            assert am[k] == bm[k], k
