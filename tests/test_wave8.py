"""STR packing, histogram matching, DTW join: invariants + replays."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.boxes import boxes_from_ids
from data_model_spark.operators.dtw import (
    DTW_THETA,
    _dtw_replay,
    _offset_fixture_df,
    dtw_np,
    dtw_pairs,
)
from data_model_spark.operators.histmatch import hist_match_lut
from data_model_spark.operators.str_pack import PAGE_CAP, str_pack


# ---------------------------------------------------------------------------
# STR packing
# ---------------------------------------------------------------------------


def test_str_pages_respect_capacity_and_partition(spark):
    n = 900
    ids = spark.range(n).select(F.col("id").alias("event_id"))
    boxes = boxes_from_ids(ids)
    pages = str_pack(boxes).collect()
    assert all(r.n_entries <= PAGE_CAP for r in pages)
    assert sum(r.n_entries for r in pages) == n
    # every page MBR sits inside its scene's bbox
    sb = {
        r.scene: (r.x0, r.y0, r.x1, r.y1)
        for r in boxes.groupBy("scene")
        .agg(F.min("x0").alias("x0"), F.min("y0").alias("y0"),
             F.max("x1").alias("x1"), F.max("y1").alias("y1"))
        .collect()
    }
    for r in pages:
        bx0, by0, bx1, by1 = sb[r.scene]
        assert bx0 <= r.x0 and by0 <= r.y0 and r.x1 <= bx1 and r.y1 <= by1
        assert r.semi_perim == (r.x1 - r.x0) + (r.y1 - r.y0)


def test_str_page_count_matches_formula(spark):
    """Per (scene, slice): pages = ceil(slice_n / C); slices hold at
    most S*C entries (the published STR slice size)."""
    ids = spark.range(640).select(F.col("id").alias("event_id"))
    pages = str_pack(boxes_from_ids(ids), capacity=4).collect()
    from collections import defaultdict

    per_slice = defaultdict(int)
    slice_pages = defaultdict(set)
    per_scene = defaultdict(int)
    for r in pages:
        per_slice[(r.scene, r.slice)] += r.n_entries
        slice_pages[(r.scene, r.slice)].add(r.page)
        per_scene[r.scene] += r.n_entries
    for key, cnt in per_slice.items():
        assert len(slice_pages[key]) == -(-cnt // 4)
    for scene, n in per_scene.items():
        p = -(-n // 4)
        s = int(np.ceil(np.sqrt(p)))
        assert all(c <= s * 4 for k, c in per_slice.items() if k[0] == scene)


def test_str_is_deterministic(spark):
    ids = spark.range(300).select(F.col("id").alias("event_id"))
    a = sorted(map(tuple, str_pack(boxes_from_ids(ids)).collect()))
    b = sorted(map(tuple, str_pack(boxes_from_ids(ids)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# histogram matching
# ---------------------------------------------------------------------------


def test_hist_match_identity_when_scene_is_corpus(spark):
    """A scene whose distribution IS the reference maps to itself."""
    vals = spark.range(1000).select(
        F.lit(0).cast("long").alias("scene"),
        F.pmod(F.col("id") * 13, F.lit(37)).alias("v"),
    )
    lut = hist_match_lut(vals).collect()
    assert all(r.mapped == r.v for r in lut)
    assert len(lut) == 37


def test_hist_match_is_monotone_and_exact(spark, sf_dir):
    from data_model_spark.operators.histmatch import (
        N_SCENES,
        _scene_values,
    )
    from data_model_spark.sources.tables import load_table

    vals = _scene_values(load_table(spark, sf_dir, "events"))
    lut = {
        (r.scene, r.v): r.mapped for r in hist_match_lut(vals).collect()
    }
    pdf = vals.toPandas()
    sv = pdf.groupby(["scene", "v"]).size()
    rv = pdf.groupby("v").size().sort_index()
    r_vals, r_cum = rv.index.to_numpy(), rv.cumsum().to_numpy()
    n_r = int(rv.sum())
    for scene in pdf["scene"].unique():
        sub = sv[scene].sort_index()
        cum = 0
        n_s = int(sub.sum())
        prev = None
        for v, c in sub.items():
            cum += int(c)
            want = int(r_vals[np.argmax(r_cum * n_s >= cum * n_r)])
            assert lut[(scene, v)] == want
            if prev is not None:
                assert lut[(scene, v)] >= prev  # monotone LUT
            prev = lut[(scene, v)]


# ---------------------------------------------------------------------------
# DTW
# ---------------------------------------------------------------------------


def test_dtw_identical_tracks_cost_zero():
    x = np.array([0, 5, 9, 2], dtype=np.int64)
    y = np.array([1, 1, 7, 3], dtype=np.int64)
    assert dtw_np(x, y, x, y) == 0


def test_dtw_elasticity_golden():
    """B resamples A's segment: the warp absorbs the extra point at the
    cost of its nearest-match distance only."""
    assert dtw_np([0, 10], [0, 0], [0, 5, 10], [0, 0, 0]) == 25


def test_dtw_matches_naive_dp():
    rng = np.random.RandomState(7)
    for _ in range(8):
        n, m = rng.randint(3, 12), rng.randint(3, 12)
        ax, ay = rng.randint(-20, 20, n), rng.randint(-20, 20, n)
        bx, by = rng.randint(-20, 20, m), rng.randint(-20, 20, m)
        big = 1 << 62
        D = np.full((n + 1, m + 1), big, dtype=np.int64)
        D[0, 0] = 0
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dd = (ax[i-1]-bx[j-1]) ** 2 + (ay[i-1]-by[j-1]) ** 2
                D[i, j] = dd + min(D[i-1, j], D[i, j-1], D[i-1, j-1])
        assert dtw_np(ax, ay, bx, by) == int(D[n, m])


def test_dtw_spark_equals_replay(spark):
    got = sorted(
        (r.key_a, r.key_b, r.dtw)
        for r in dtw_pairs(_offset_fixture_df(spark)).collect()
    )
    assert got == sorted(_dtw_replay())
    assert 0 < len(got) < 66  # real accepts AND real rejections
