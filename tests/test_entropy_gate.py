"""Entropy gate: exact histogram math, population separation, keep rule."""

import numpy as np

from data_model_spark.operators.vision_curation import (
    ENT_MIN_LEVELS,
    ENT_MIN_MBITS,
    entropy_stats,
    entropy_stats_np,
)
from data_model_spark.sources.images import generate_images_df


def test_constant_image_zero_entropy():
    n, levels, modal, mbits, keep = entropy_stats_np(
        np.full((32, 32), 7, np.uint8)
    )
    assert (n, levels, modal, mbits, keep) == (1024, 1, 1024, 0, False)


def test_two_level_image_one_bit():
    a = np.zeros((16, 16), np.uint8)
    a[:, 8:] = 255
    n, levels, modal, mbits, keep = entropy_stats_np(a)
    assert (levels, mbits, keep) == (2, 1000, False)


def test_uniform_256_levels_eight_bits():
    a = np.arange(256, dtype=np.uint8).repeat(4).reshape(32, 32)
    n, levels, modal, mbits, keep = entropy_stats_np(a)
    assert (levels, modal, mbits, keep) == (256, 4, 8000, True)


def test_distributed_matches_replay_and_separates_populations(spark):
    from data_model_spark.codecs import decode_image, encode_image
    from data_model_spark.sources import images as img

    rows = {r.image_id: r for r in
            entropy_stats(generate_images_df(spark, 24)).collect()}
    assert len(rows) == 24
    kept, dropped = 0, 0
    for image_id, r in rows.items():
        i = img.image_index(image_id)
        w, h = img.image_dims(i)
        fmt = img.image_fmt(i)
        raw = img.synth_pixels(image_id, w, h)
        a = decode_image(encode_image(raw, fmt), fmt, w, h)
        exp = entropy_stats_np((a >> 8).astype(np.uint8))
        assert (r.n_pix, r.n_levels, r.modal_count, r.ent_mbits, r.keep) == exp
        assert r.keep == (r.ent_mbits >= ENT_MIN_MBITS
                          and r.n_levels >= ENT_MIN_LEVELS)
        kept += r.keep
        dropped += not r.keep
    # fixture spans both sides of the gate (textured scenes vs masks)
    assert kept > 0 and dropped > 0
