"""Areal interpolation: exact weights, bucket-join losslessness, mass."""

from pyspark.sql import functions as F

from data_model_spark.operators.areal import (
    W_SCALE,
    areal_interpolate,
    source_rects,
    target_grid,
)
from data_model_spark.sources.tables import load_table, local_df


def _src(spark, rows):
    return local_df(
        spark, rows, "src_id string, sx0 long, sy0 long, sx1 long, sy1 long, val long"
    )


def _tgt(spark, rows):
    return local_df(
        spark, rows, "tgt_id string, tx0 long, ty0 long, tx1 long, ty1 long"
    )


def test_single_source_split_across_four_targets(spark):
    # 200x200 rect centered on the 4-corner point (1000, 1000): quarters
    src = _src(spark, [("s", 900, 900, 1100, 1100, 40)])
    tgt = _tgt(
        spark,
        [
            ("t00", 0, 0, 1000, 1000),
            ("t10", 1000, 0, 2000, 1000),
            ("t01", 0, 1000, 1000, 2000),
            ("t11", 1000, 1000, 2000, 2000),
        ],
    )
    got = {r.tgt_id: (r.n_src, r.est_scaled) for r in areal_interpolate(src, tgt).collect()}
    # each quarter: 100*100 / (200*200) = 1/4 of val -> 10 * W_SCALE
    assert got == {k: (1, 10 * W_SCALE) for k in ("t00", "t10", "t01", "t11")}


def test_source_fully_inside_one_target_transfers_all_mass(spark):
    src = _src(spark, [("s", 1200, 1300, 1500, 1800, 7)])
    tgt = _tgt(spark, [("t", 1000, 1000, 2000, 2000), ("u", 0, 0, 1000, 1000)])
    got = {r.tgt_id: (r.n_src, r.est_scaled) for r in areal_interpolate(src, tgt).collect()}
    assert got == {"t": (1, 7 * W_SCALE), "u": (0, 0)}


def test_fixture_mass_conservation_and_zero_targets(spark, sf_dir):
    src = source_rects(load_table(spark, sf_dir, "supplier"))
    tgt = target_grid(load_table(spark, sf_dir, "nation"))
    out = areal_interpolate(src, tgt).collect()
    assert len(out) == 25  # every target zone present, zeros included
    # every source rect lies inside [0,4600)x[0,4800) = within the 5x5 km
    # grid, so ALL mass lands on some target: sum of scaled estimates ==
    # sum of val * W_SCALE up to the per-pair truncation (< 1 per pair)
    total_est = sum(r.est_scaled for r in out)
    total_val = src.agg(F.sum("val")).collect()[0][0] * W_SCALE
    n_pairs = sum(r.n_src for r in out)
    assert total_val - n_pairs < total_est <= total_val
    assert n_pairs > src.count()  # sources genuinely split across targets


def test_bucket_join_matches_exhaustive_overlay(spark, sf_dir):
    # ground truth: plain O(S x T) overlay in the driver
    src = source_rects(load_table(spark, sf_dir, "supplier")).collect()
    tgt = target_grid(load_table(spark, sf_dir, "nation")).collect()
    exp = {t.tgt_id: [0, 0] for t in tgt}
    for s in src:
        for t in tgt:
            ix = min(s.sx1, t.tx1) - max(s.sx0, t.tx0)
            iy = min(s.sy1, t.ty1) - max(s.sy0, t.ty0)
            if ix > 0 and iy > 0:
                exp[t.tgt_id][0] += 1
                exp[t.tgt_id][1] += (
                    s.val * ix * iy * W_SCALE // ((s.sx1 - s.sx0) * (s.sy1 - s.sy0))
                )
    got = {
        r.tgt_id: [r.n_src, r.est_scaled]
        for r in areal_interpolate(
            source_rects(load_table(spark, sf_dir, "supplier")),
            target_grid(load_table(spark, sf_dir, "nation")),
        ).collect()
    }
    assert got == exp
