"""Joint image+caption near-dup verdict properties."""

from data_model_spark.operators.multimodal import _N_IMG_QUERY, joint_neardup_pairs
from data_model_spark.sources import images as img_src


def test_joint_verdict_partition(spark):
    rows = joint_neardup_pairs(spark, None).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r.img_a < r.img_b
        key = (r.img_a, r.img_b)
        assert key not in seen  # full outer join must not duplicate pairs
        seen.add(key)
        if r.verdict == "both":
            assert r.hamming is not None and r.jaccard is not None
        elif r.verdict == "image_only":
            assert r.hamming is not None and r.jaccard is None
        else:
            assert r.verdict == "caption_only"
            assert r.hamming is None and r.jaccard is not None
        if r.hamming is not None:
            assert 0 <= r.hamming <= 3
        if r.jaccard is not None:
            assert r.jaccard >= 0.3


def test_caption_candidates_are_same_band(spark):
    """Bigram-shingle Jaccard >= 0.3 surfaces exactly the same-band pairs:
    'band bXX' + 'bXX utm...' shared (2 of 6 distinct bigrams, J=1/3);
    cross-band captions share no bigram at all."""
    rows = joint_neardup_pairs(spark, None).collect()
    cap_pairs = {(r.img_a, r.img_b) for r in rows if r.jaccard is not None}
    assert cap_pairs
    for a, b in cap_pairs:
        assert img_src.band_for(img_src.image_index(a)) == img_src.band_for(
            img_src.image_index(b)
        )
    # completeness: every same-band pair of the fixture is present
    by_band = {}
    for i in range(_N_IMG_QUERY):
        by_band.setdefault(img_src.band_for(i), []).append(f"img_{i:012d}")
    want = {
        (a, b)
        for ids in by_band.values()
        for x, a in enumerate(ids)
        for b in ids[x + 1 :]
    }
    assert cap_pairs == want


def test_crafted_both_branch(spark):
    """Crafted table pins all three verdicts, including 'both' (the
    generated fixture never produces phash-close same-band scenes)."""
    from data_model_spark.operators.multimodal import joint_neardup
    from data_model_spark.sources.tables import local_df

    rows = [
        # both: 1-bit phash flip + same-template captions (J=1.0)
        ("a", 0x1234_5678_9ABC_DEF0, "red barn under snow"),
        ("b", 0x1234_5678_9ABC_DEF1, "red barn under snow"),
        # image_only: phash equal, captions share no bigram
        ("c", 0x0F0F_0F0F_0F0F_0F0F, "city street at night"),
        ("d", 0x0F0F_0F0F_0F0F_0F0F, "alpine lake morning fog"),
        # caption_only: captions overlap, phash far (alternating bits)
        ("e", 0x0000_0000_0000_0000, "green field wide pasture"),
        ("f", 0x5555_5555_5555_5555, "green field wide meadow"),
    ]
    imgs = local_df(
        spark,
        [(i, p - (1 << 64) if p >= (1 << 63) else p, c) for i, p, c in rows],
        "image_id string, phash long, caption string",
    )
    got = {(r.img_a, r.img_b): r for r in joint_neardup(imgs).collect()}
    assert got[("a", "b")].verdict == "both"
    assert got[("a", "b")].hamming == 1 and got[("a", "b")].jaccard == 1.0
    assert got[("c", "d")].verdict == "image_only"
    assert got[("c", "d")].hamming == 0
    assert got[("e", "f")].verdict == "caption_only"
    # "green field" + "field wide" shared: J = 2 / 4
    assert got[("e", "f")].jaccard == 0.5
    assert set(got) == {("a", "b"), ("c", "d"), ("e", "f")}
