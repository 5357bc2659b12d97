"""Hilbert curve key: exhaustive bijectivity + unit-step locality proof.

The defining property a layout key earns its keep by: CONSECUTIVE codes
are adjacent cells, so ANY contiguous code range (a parquet row group, a
partition's code interval) is spatially compact — aligned or not, which
is where Morton's diagonal jumps lose locality.
"""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.plans.partitioning import (
    hilbert_key,
    with_hilbert,
    zorder_key,
)

BITS = 6
N = 1 << BITS


def _grid(spark):
    return spark.range(N * N).select(
        (F.col("id") % N).alias("gx"),
        (F.col("id") / N).cast("long").alias("gy"),
    )


def _curve_hilbert(spark):
    rows = with_hilbert(_grid(spark), "gx", "gy", bits=BITS, out="d").collect()
    return {r.d: (r.gx, r.gy) for r in rows}


def _curve_morton(spark):
    rows = (
        _grid(spark)
        .withColumn("d", zorder_key("gx", "gy", bits=BITS))
        .collect()
    )
    return {r.d: (r.gx, r.gy) for r in rows}


def test_hilbert_bijective_with_unit_steps(spark):
    cells = _curve_hilbert(spark)
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
    h = _curve_hilbert(spark)
    z = _curve_morton(spark)

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


def test_column_form_matches_projection_form_and_scalar(spark):
    """hilbert_key (single Column, golden/test form) == with_hilbert
    (production projection chain) == the scalar recurrence."""

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

    rng = np.random.default_rng(3)
    pts = [(int(rng.integers(0, N)), int(rng.integers(0, N))) for _ in range(64)]
    df = spark.createDataFrame(pts, "gx long, gy long")
    col_form = {
        (r.gx, r.gy): r.d
        for r in df.withColumn("d", hilbert_key("gx", "gy", bits=BITS)).collect()
    }
    proj_form = {
        (r.gx, r.gy): r.d
        for r in with_hilbert(df, "gx", "gy", bits=BITS, out="d").collect()
    }
    for x, y in pts:
        assert col_form[(x, y)] == proj_form[(x, y)] == scalar(x, y)
