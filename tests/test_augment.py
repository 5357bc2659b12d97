"""Vision-training image ops: augmentation, ViT patches, CutMix."""

import numpy as np
from pyspark.sql import functions as F

from data_model_spark.operators.augment import (
    N_IMG,
    PATCH_VAR_T,
    _decoded,
    _wsum,
    augment_np,
    augment_stats,
    cutmix_np,
    cutmix_stats,
    patch_stats_np,
    vit_patch_stats,
)


def test_augment_chain_golden_orientation():
    """8x8 ramp through i=1 (hflip then rot90 k=1): pin exact corner
    cells so a wrong flip axis / rotation sign fails loudly."""
    a = np.arange(64, dtype=np.uint16).reshape(8, 8)
    out = augment_np(a, 1)
    want = np.rot90(a[:, ::-1], k=1)
    assert out.shape == (8, 8)
    assert (out == want).all()
    # explicit corners: hflip maps (r, c)->(r, 7-c); rot90 k=1 maps
    # (r, c)->(7-c, r), so out[r, c] == a[c, 7-(7-r)] == a[c, r]
    assert out[0, 0] == a[0, 0] and out[0, 7] == a[7, 0]
    assert out[7, 0] == a[0, 7] and out[7, 7] == a[7, 7]


def test_augment_identity_when_i_multiple_of_4_even():
    a = _decoded(0)
    out = augment_np(a, 0)  # no flip, k=0, 64x64 already /8
    assert (out == a).all()


def test_augment_preserves_pixel_multiset_without_crop():
    a = _decoded(0)  # 64x64: crop is a no-op at every rotation
    for i in range(8):
        out = augment_np(a, i)
        assert sorted(out.ravel()) == sorted(a.ravel())


def test_patch_informative_threshold_branches():
    flat = np.full((32, 32), 1000, dtype=np.uint16)
    n, inf, s, _ = patch_stats_np(flat)
    assert (n, inf) == (4, 0)  # constant patches carry no information
    noisy = flat.copy()
    noisy[::2, ::2] = 2000  # checker quarter: variance >> threshold
    n2, inf2, _, _ = patch_stats_np(noisy)
    assert n2 == 4 and inf2 == 4
    # threshold is exact: variance numerator must strictly exceed T*n^2
    eps = flat.copy().astype(np.int64)
    eps[0, 0] += 1  # tiny variance in one patch only
    n3, inf3, _, _ = patch_stats_np(eps.astype(np.uint16))
    assert inf3 == 0


def test_cutmix_lambda_and_paste_exactness():
    a = np.zeros((64, 64), dtype=np.uint16)
    b = np.full((64, 64), 7, dtype=np.uint16)
    mixed, lam = cutmix_np(a, b, 0)
    box_px = int((mixed == 7).sum())
    assert lam == 1_000_000 - box_px * 1_000_000 // (64 * 64)
    assert box_px > 0
    # everything outside the box is untouched
    assert int(mixed.sum()) == 7 * box_px


def test_spark_paths_equal_replay(spark):
    """All three operators: engine over real bytes == sequential replay
    (smaller image count than the oracle fixture)."""
    from data_model_spark.sources.images import generate_images_df

    n = 12
    images = generate_images_df(spark, n)
    got_a = {tuple(r) for r in augment_stats(images).collect()}
    got_p = {tuple(r) for r in vit_patch_stats(images).collect()}
    got_c = {tuple(r) for r in cutmix_stats(images, n).collect()}
    want_a, want_p, want_c = set(), set(), set()
    for i in range(n):
        d = _decoded(i)
        out = augment_np(d, i)
        want_a.add(
            (f"img_{i:012d}", out.shape[0], out.shape[1],
             int(out.astype(np.int64).sum()), _wsum(out))
        )
        want_p.add((f"img_{i:012d}", *patch_stats_np(d)))
        mixed, lam = cutmix_np(d, _decoded((i + 1) % n), i)
        want_c.add(
            (f"img_{i:012d}", lam, int(mixed.astype(np.int64).sum()),
             _wsum(mixed))
        )
    assert got_a == want_a
    assert got_p == want_p
    assert got_c == want_c
