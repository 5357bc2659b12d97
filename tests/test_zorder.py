"""Z-order write clustering (plans/partitioning.py: zorder_key/zorder_partition)."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from data_model_spark.plans import partitioning as pp


def _interleave_np(x: int, y: int, bits: int = 14) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@pytest.fixture(scope="module")
def grid(spark):
    # 256x256 dense tile grid: big enough that one output file holds MANY
    # parquet row groups (forced small below), which is the granularity the
    # Z-order claim lives at — each row group covers a contiguous z-run.
    df = spark.range(0, 65536).select(
        F.lit(0).alias("level"),
        (F.col("id") % 256).alias("tile_x"),
        (F.col("id") / 256).cast("long").alias("tile_y"),
        F.col("id").alias("payload"),
    )
    df.cache().count()
    return df


class TestZOrderKey:
    def test_matches_numpy_interleave(self, spark):
        vals = [(0, 0), (1, 0), (0, 1), (63, 63), (100, 7), (16383, 1)]
        df = spark.createDataFrame(vals, "tile_x long, tile_y long").withColumn(
            "z", pp.zorder_key()
        )
        got = {(r.tile_x, r.tile_y): r.z for r in df.collect()}
        for x, y in vals:
            assert got[(x, y)] == _interleave_np(x, y), (x, y)

    def test_jvm_only_no_python_stage(self, spark, grid):
        plan = grid.withColumn("z", pp.zorder_key())._jdf.queryExecution()
        assert "BatchEvalPython" not in plan.executedPlan().toString()


class TestZOrderClustering:
    def _xy_extents(self, path: str) -> tuple[int, int]:
        """Summed (x, y) min-max extents over all parquet row groups."""
        ex = ey = 0
        for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
            md = pq.ParquetFile(f).metadata
            cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                sx = md.row_group(rg).column(cols["tile_x"]).statistics
                sy = md.row_group(rg).column(cols["tile_y"]).statistics
                ex += sx.max - sx.min
                ey += sy.max - sy.min
        return ex, ey

    def test_rows_preserved(self, spark, grid, tmp_path):
        out = str(tmp_path / "z")
        pp.zorder_partition(grid, 8, grid_bits=8).write.mode("overwrite").parquet(out)
        assert spark.read.parquet(out).count() == 65536

    def test_tighter_2d_stats_than_y_bands(self, spark, grid, tmp_path):
        """The claim that justifies Z-order at 100 TB: row-group stats bound
        BOTH axes (each row group is a contiguous z-run), so bbox queries
        skip row groups in x AND y.  Row groups are forced small so each
        file holds many, as a 100+ MB production file does."""
        band_out = str(tmp_path / "band")
        z_out = str(tmp_path / "zord")
        small_rg = str(64 * 1024)
        (pp.spatial_block_partition(grid, 8).write.mode("overwrite")
         .option("parquet.block.size", small_rg).parquet(band_out))
        (pp.zorder_partition(grid, 8, grid_bits=8).write.mode("overwrite")
         .option("parquet.block.size", small_rg).parquet(z_out))

        band_x, band_y = self._xy_extents(band_out)
        z_x, z_y = self._xy_extents(z_out)
        # y-band row groups run in (y, x) order: tile_x spans the full level
        # width per row group.  Z-order must cut the summed x-extent >= 2x
        # and win on the combined (x + y) extent too.
        assert z_x <= band_x / 2, (z_x, band_x)
        assert z_x + z_y < band_x + band_y, (z_x, z_y, band_x, band_y)
