"""zorder_regions: locality contract of the Morton layout query."""

from data_model_spark.operators.layout import (
    GRID_BITS,
    REGION_SHIFT,
    grid_points,
    zorder_region_stats,
)
from data_model_spark.sources.tables import load_table


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_regions_are_aligned_8x8_blocks(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    pts = grid_points(cust)
    out = zorder_region_stats(pts).toPandas()
    assert len(out) > 1  # multiple regions: the split actually splits
    # a contiguous aligned run of 2**REGION_SHIFT Morton codes is exactly
    # an 8x8 spatial block: both extents < 8 and the span inside a region
    assert ((out.max_gx - out.min_gx) < 8).all()
    assert ((out.max_gy - out.min_gy) < 8).all()
    assert (out.z_span < (1 << REGION_SHIFT)).all()
    # every point lands in exactly one region
    assert out.n_points.sum() == cust.count()


def test_spark_morton_matches_pure_python(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").limit(64)
    rows = grid_points(cust).collect()
    from data_model_spark.plans.partitioning import zorder_key

    zs = {
        r.point_id: r.z
        for r in grid_points(cust)
        .withColumn("z", zorder_key("gx", "gy", bits=GRID_BITS))
        .collect()
    }
    for r in rows:
        assert zs[r.point_id] == _morton(r.gx, r.gy, GRID_BITS)
