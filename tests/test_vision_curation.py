"""Web-corpus image-curation filters: blur, CLIP-score, exact dedup."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.vision_curation import (
    ASPECT_BUCKETS,
    CLIP_T,
    DUP_STRIDE,
    EXP_HIGH_T,
    EXP_LOW_T,
    LAP_VAR_T,
    N_IMG,
    _decoded,
    _dup_bytes,
    aspect_bucket_rollup,
    blur_scores,
    box3_np,
    crossmodal_scores,
    exact_dup_groups,
    exposure_stats,
    exposure_stats_np,
    lap_stats_np,
    planted_dups_df,
    with_aspect_bucket,
)


# ---------------------------------------------------------------------------
# blur detection kernel
# ---------------------------------------------------------------------------


def test_box3_exact_integer_mean():
    a = np.arange(25, dtype=np.int64).reshape(5, 5)
    out = box3_np(a)
    assert out.shape == (3, 3)
    # center cell: mean of the full 3x3 around (2,2) = 12 exactly
    assert out[1, 1] == 12
    # corner of valid region: 3x3 around (1,1) sums to 54 -> 54//9 == 6
    assert out[0, 0] == 6


def test_laplacian_constant_image_is_not_sharp():
    n, ss, sharp = lap_stats_np(np.full((16, 16), 1234, dtype=np.int64))
    assert (n, ss, sharp) == (14 * 14, 0, False)


def test_laplacian_checker_is_sharp():
    a = np.zeros((16, 16), dtype=np.int64)
    a[::2, ::2] = 4000  # high-frequency content maximizes |L|
    n, ss, sharp = lap_stats_np(a)
    assert n == 14 * 14 and ss > 0 and sharp


def test_sharp_verdict_has_no_int64_overflow_path():
    """512x512 full-range checkerboard: |L| = 20000 everywhere, so
    n*ss ~ 2.7e19 > 2^63 — the verdict must be computed in Python ints,
    while the REPORTED ss stays in int64."""
    a = np.zeros((512, 512), dtype=np.int64)
    a[::2, ::2] = 5000
    a[1::2, 1::2] = 5000
    n, ss, sharp = lap_stats_np(a)
    assert ss < 2**63
    assert n * ss > 2**63  # the cross-multiplied term really does overflow
    assert sharp


def test_blur_variant_separates_populations():
    """On reflectance fixtures the detector must flag orig sharp and the
    3x3-blurred copy not sharp; class masks are not sharp either way."""
    for i in (0, 1, 2):  # b01/b02/b03 reflectance bands
        a = _decoded(i)
        assert lap_stats_np(a)[2] is True
        assert lap_stats_np(box3_np(a))[2] is False
    a13 = _decoded(13)  # scl class mask: low information as stored
    assert lap_stats_np(a13)[2] is False


def test_blur_scores_spark_equals_replay(spark):
    from data_model_spark.sources.images import generate_images_df

    n = 8
    got = {tuple(r) for r in blur_scores(generate_images_df(spark, n)).collect()}
    want = set()
    for i in range(n):
        a = _decoded(i)
        for variant, arr in (("orig", a), ("blur", box3_np(a))):
            nn, ss, sharp = lap_stats_np(arr)
            want.add((f"img_{i:012d}", variant, nn, ss, sharp))
    assert got == want
    assert len(got) == 2 * n


# ---------------------------------------------------------------------------
# CLIP-score cross-modal filter
# ---------------------------------------------------------------------------


def test_crossmodal_self_pairs_score_one(spark):
    from data_model_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    out = crossmodal_scores(emb).collect()
    n_emb = emb.count()
    assert len(out) == n_emb  # XOR-1 partner always exists (even count)
    by_id = {r.vec_id: r for r in out}
    for vid, r in by_id.items():
        if vid % 3 == 0:
            assert r.txt_id == vid and r.clip_score == 1.0 and r.kept
        else:
            assert r.txt_id == vid ^ 1
    # the gate is non-trivial: keeps all aligned pairs plus few others
    kept = sum(r.kept for r in out)
    aligned = sum(1 for r in out if r.vec_id % 3 == 0)
    assert aligned <= kept < n_emb


def test_crossmodal_numpy_replay(spark):
    """Spark cosine (zip_with/aggregate, HALF_UP round 6) == NumPy."""
    from data_model_spark.sources.tables import load_table
    from decimal import ROUND_HALF_UP, Decimal

    emb_df = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb_df.collect()}
    got = {r.vec_id: r.clip_score for r in crossmodal_scores(emb_df).collect()}
    for vid, v in vecs.items():
        tid = vid if vid % 3 == 0 else vid ^ 1
        t = vecs[tid]
        cos = float(v @ t) / (np.sqrt(float(v @ v)) * np.sqrt(float(t @ t)))
        want = float(
            Decimal(repr(cos)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )
        assert abs(got[vid] - want) < 1e-12, vid


# ---------------------------------------------------------------------------
# exact byte dedup
# ---------------------------------------------------------------------------


def test_planted_dup_bytes_are_byte_identical(spark):
    from data_model_spark.sources.images import generate_images_df

    base = {r.image_id: bytes(r.bytes)
            for r in generate_images_df(spark, N_IMG).collect()}
    dups = {r.image_id: bytes(r.bytes) for r in planted_dups_df(spark).collect()}
    assert len(dups) == N_IMG // DUP_STRIDE
    for i in range(0, N_IMG, DUP_STRIDE):
        assert dups[f"dup_{i:012d}"] == base[f"img_{i:012d}"]


def test_exact_dup_groups_finds_exactly_the_planted_pairs(spark):
    from data_model_spark.sources.images import generate_images_df

    base = generate_images_df(spark, N_IMG).select("image_id", "bytes")
    out = exact_dup_groups(base.unionByName(planted_dups_df(spark))).collect()
    assert len(out) == N_IMG // DUP_STRIDE
    for r in out:
        assert r.n_copies == 2
        a, b = r.ids.split(",")
        assert a.replace("dup_", "") == b.replace("img_", "")


def test_exact_dup_groups_empty_without_plants(spark):
    from data_model_spark.sources.images import generate_images_df

    base = generate_images_df(spark, 16).select("image_id", "bytes")
    assert exact_dup_groups(base).count() == 0


# ---------------------------------------------------------------------------
# aspect-ratio bucketing
# ---------------------------------------------------------------------------


def _nearest_bucket(w: int, h: int) -> str:
    """Float replay of the exact-integer argmin (ties by ladder index)."""
    best = min(
        range(len(ASPECT_BUCKETS)),
        key=lambda i: (
            abs(w / h - ASPECT_BUCKETS[i][1] / ASPECT_BUCKETS[i][2]),
            i,
        ),
    )
    return ASPECT_BUCKETS[best][0]


def test_aspect_bucket_exact_assignments(spark):
    from data_model_spark.sources.tables import local_df

    cases = [
        (512, 512, "square"),
        (640, 480, "landscape_4_3"),
        (480, 640, "portrait_3_4"),
        (1920, 1080, "wide_16_9"),
        (1080, 1920, "tall_9_16"),
        (1000, 500, "pano_2_1"),
        (500, 1000, "column_1_2"),
        (512, 256, "pano_2_1"),  # exact 2:1 from the fixture dim cycle
        (64, 512, "column_1_2"),  # ratio 1/8: nearest rung is 1:2
        (512, 64, "pano_2_1"),  # ratio 8: nearest rung is 2:1
    ]
    df = local_df(
        spark, [(i, w, h) for i, (w, h, _) in enumerate(cases)],
        "image_id bigint, w int, h int",
    )
    got = {r.image_id: r.bucket for r in with_aspect_bucket(df).collect()}
    for i, (w, h, want) in enumerate(cases):
        assert got[i] == want, (w, h, got[i])
        assert _nearest_bucket(w, h) == want  # the float replay agrees


def test_aspect_assignment_plan_is_shuffle_free(spark):
    """The bucket column must be a pure projection — no Exchange before
    the rollup's single 7-group aggregate."""
    from data_model_spark.sources.images import generate_images_meta_df

    meta = generate_images_meta_df(spark, 64).select("image_id", "w", "h")
    plan = with_aspect_bucket(meta)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rollup_plan = aspect_bucket_rollup(meta)._jdf.queryExecution().executedPlan().toString()
    assert rollup_plan.count("Exchange") == 1  # only the groupBy(bucket)


def test_aspect_rollup_totals(spark):
    from data_model_spark.sources.images import generate_images_meta_df, image_dims

    n = 99
    meta = generate_images_meta_df(spark, n).select("image_id", "w", "h")
    out = aspect_bucket_rollup(meta).collect()
    assert sum(r.n_images for r in out) == n
    assert sum(r.px_sum for r in out) == sum(
        image_dims(i)[0] * image_dims(i)[1] for i in range(n)
    )


# ---------------------------------------------------------------------------
# exposure QA
# ---------------------------------------------------------------------------


def test_exposure_kernel_tail_counts():
    a = np.array([[500, 600, 601], [3899, 3900, 5000]], dtype=np.int64)
    n, lo, hi, s, well = exposure_stats_np(a)
    assert (n, lo, hi, s) == (6, 2, 2, int(a.sum()))
    assert not well  # 2/6 in each tail >= 10%


def test_exposure_well_exposed_boundary_is_strict():
    # exactly 10% in a tail must FAIL (strict <): 1 low of 10 pixels
    a = np.full(10, 2000, dtype=np.int64)
    a[0] = 100
    assert exposure_stats_np(a)[4] is False
    # 1 of 11 (9.09%) passes
    b = np.full(11, 2000, dtype=np.int64)
    b[0] = 100
    assert exposure_stats_np(b)[4] is True


def test_exposure_spark_equals_replay_and_flags_masks(spark):
    from data_model_spark.sources.images import band_for, generate_images_df

    n = 16
    got = {r.image_id: tuple(r)[1:]
           for r in exposure_stats(generate_images_df(spark, n)).collect()}
    for i in range(n):
        want = exposure_stats_np(_decoded(i))
        assert got[f"img_{i:012d}"] == want, i
        if band_for(i) in ("scl", "cld", "snw"):
            assert want[4] is False  # masks read as fully clipped-low
