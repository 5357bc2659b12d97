"""Hilbert curve key: exhaustive bijectivity + unit-step locality proof.

The defining property a layout key earns its keep by: CONSECUTIVE codes
are adjacent cells, so ANY contiguous code range (a parquet row group, a
partition's code interval) is spatially compact — aligned or not, which
is where Morton's diagonal jumps lose locality.
"""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.plans.partitioning import hilbert_key, zorder_key

BITS = 6
N = 1 << BITS


def _curve(spark, key_fn):
    """(d -> (x, y)) mapping computed BY THE SPARK EXPRESSION over the
    full grid."""
    grid = (
        spark.range(N * N)
        .select(
            (F.col("id") % N).alias("gx"),
            (F.col("id") / N).cast("long").alias("gy"),
        )
        .withColumn("d", key_fn("gx", "gy", bits=BITS))
    )
    rows = grid.collect()
    return {r.d: (r.gx, r.gy) for r in rows}


def test_hilbert_bijective_with_unit_steps(spark):
    cells = _curve(spark, hilbert_key)
    assert len(cells) == N * N  # bijective over the full grid
    assert min(cells) == 0 and max(cells) == N * N - 1
    steps = [
        abs(cells[d][0] - cells[d - 1][0]) + abs(cells[d][1] - cells[d - 1][1])
        for d in range(1, N * N)
    ]
    assert set(steps) == {1}  # every consecutive pair is 4-adjacent


def test_hilbert_beats_morton_on_unaligned_ranges(spark):
    """For contiguous but UNALIGNED code windows (the row-group boundary
    case), Hilbert's worst-case bbox stays strictly tighter than
    Morton's — the measurable reason to prefer it as the cluster key."""
    h = _curve(spark, hilbert_key)
    z = _curve(spark, zorder_key)

    def worst_extent(cells, win=64, stride=17):
        worst = 0
        ds = sorted(cells)
        for lo in range(0, len(ds) - win, stride):
            pts = [cells[d] for d in ds[lo : lo + win]]
            xs, ys = zip(*pts)
            worst = max(worst, (max(xs) - min(xs)) + (max(ys) - min(ys)))
        return worst

    wh, wz = worst_extent(h), worst_extent(z)
    assert wh < wz, (wh, wz)


def test_hilbert_matches_scalar_recurrence(spark):
    def scalar(x, y, bits=BITS):
        d, s = 0, 1 << (bits - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    cells = _curve(spark, hilbert_key)
    rng = np.random.default_rng(3)
    for _ in range(200):
        x, y = int(rng.integers(0, N)), int(rng.integers(0, N))
        d = scalar(x, y)
        assert cells[d] == (x, y)
