"""Oracle twins for the multimodal decode paths and polygon zonal stats.

Extends the ``mosaic_fp`` fingerprint-twin pattern to the remaining
deterministic rows-only fixtures: every input here is a seeded synthetic
table (images / fake-PCM clips / fake-rawgray video / the merged tile
mosaic), so a sequential replay computes the engine's exact output rows
and emits them as a DuckDB VALUES literal.  Float columns come from the
same NumPy operations on the same arrays — IEEE-identical, not
approximately equal; the one engine-side double REDUCTION (the per-clip
frame-mean average) is replayed as the same left-fold its single Arrow
partial computes.
"""

from __future__ import annotations

import numpy as np

from .mosaic_fp import _r, _values_sql
from .registry import register


def _images_pdf(n: int = 48):
    from ..sources.images import generate_images_pandas

    return generate_images_pandas(n)


# ---------------------------------------------------------------------------
# image features / thumbnails / validation
# ---------------------------------------------------------------------------


def _image_features_oracle() -> str:
    from ..codecs import decode_image

    rows = []
    for row in _images_pdf().itertuples(index=False):
        a = decode_image(row.bytes, row.fmt, row.w, row.h).astype(np.float64)
        gy, gx = np.gradient(a)
        rows.append(
            (
                row.image_id,
                float(a.mean()),
                float(a.std()),
                float(np.percentile(a, 5)),
                float(np.percentile(a, 95)),
                float(np.mean(np.hypot(gy, gx))),
            )
        )
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("mean", "DOUBLE"),
            ("std", "DOUBLE"),
            ("p05", "DOUBLE"),
            ("p95", "DOUBLE"),
            ("edge_energy", "DOUBLE"),
        ],
        rows,
    )


@register("image_features_fp", _image_features_oracle)
def image_features_fp(spark, sf_dir):
    """``image_features``'s oracle twin: decode + per-image stats via
    Arrow batches vs the same kernel run sequentially."""
    from .multimodal import image_features

    return image_features(spark, sf_dir)


def _image_thumbnails_oracle() -> str:
    from ..codecs import decode_image
    from .downsample import block_mean

    rows = []
    for row in _images_pdf().itertuples(index=False):
        a = decode_image(row.bytes, row.fmt, row.w, row.h).astype(np.float64)
        th = np.asarray(block_mean(a, 8, 8)).ravel()
        rows.append((row.image_id, int(row.w), int(row.h), int(th.size)))
    return _values_sql(
        [
            ("image_id", "VARCHAR"),
            ("w", "INTEGER"),
            ("h", "INTEGER"),
            ("thumb_len", "INTEGER"),
        ],
        rows,
    )


@register("image_thumbnails_fp", _image_thumbnails_oracle)
def image_thumbnails_fp(spark, sf_dir):
    """``image_thumbnails``'s oracle twin (resize plumbing shape)."""
    from .multimodal import image_thumbnails

    return image_thumbnails(spark, sf_dir)


def _image_validation_oracle() -> str:
    from ..codecs import decode_image
    from ..codecs.registry import psnr_db
    from ..sources import images as img_src

    counts: dict[str, list[int]] = {}
    for row in _images_pdf().itertuples(index=False):
        decoded = decode_image(row.bytes, row.fmt, row.w, row.h)
        original = img_src.synth_pixels(row.image_id, row.w, row.h)
        i = img_src.image_index(row.image_id)
        c = counts.setdefault(row.fmt, [0, 0, 0, 0])
        c[0] += 1
        c[1] += int(psnr_db(original, decoded) >= 40)
        c[2] += int(row.caption == img_src.caption_for(row.image_id, i))
        c[3] += int(img_src.phash64(decoded) == row.phash)
    return _values_sql(
        [
            ("fmt", "VARCHAR"),
            ("n", "BIGINT"),
            ("n_psnr_ok", "BIGINT"),
            ("n_caption_ok", "BIGINT"),
            ("n_phash_ok", "BIGINT"),
        ],
        [(fmt, *c) for fmt, c in sorted(counts.items())],
    )


@register("image_validation_fp", _image_validation_oracle)
def image_validation_fp(spark, sf_dir):
    """``image_validation``'s oracle twin: the input_hint per-row
    invariant gate (PSNR / caption / phash), counted by fmt."""
    from .spatial_queries import image_validation

    return image_validation(spark, sf_dir)


# ---------------------------------------------------------------------------
# audio / video plumbing
# ---------------------------------------------------------------------------


def _audio_features_oracle() -> str:
    # replica of multimodal.synth_audio_clips' per-clip generator (seeded
    # fake-pcm16 fixture) followed by the extract_audio_features kernel
    rows = []
    for i in range(16):
        rng = np.random.default_rng(1000 + i)
        t = np.arange(4000 + 100 * (i % 5))
        wave = 0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t / 16000.0)
        wave += rng.normal(0, 0.01, len(t))
        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2")
        x = np.frombuffer(pcm.tobytes(), dtype="<i2").astype(np.float64) / 32768.0
        rows.append(
            (
                f"clip_{i:06d}",
                16000,
                len(x),
                float(np.sqrt(np.mean(x**2))),
                int(np.sum(np.abs(np.diff(np.signbit(x))))),
                float(np.max(np.abs(x))),
            )
        )
    return _values_sql(
        [
            ("clip_id", "VARCHAR"),
            ("sample_rate", "INTEGER"),
            ("n_samples", "INTEGER"),
            ("rms", "DOUBLE"),
            ("zero_crossings", "BIGINT"),
            ("peak", "DOUBLE"),
        ],
        rows,
    )


@register("audio_features_fp", _audio_features_oracle)
def audio_features_fp(spark, sf_dir):
    """``audio_features``'s oracle twin: binary payload + typed metadata
    -> RMS / zero-crossing / peak via mapInPandas."""
    from .multimodal import audio_features

    return audio_features(spark, sf_dir)


def _video_frames_oracle() -> str:
    # replica of multimodal.synth_video_clips(n=8, 32x24, 12 frames) +
    # sample_video_frames(every_n=2); the engine's per-clip F.avg merges a
    # single Arrow partial whose running sum adds frame means in ascending
    # frame_idx order — replayed as the same left-fold
    rows = []
    w, h, frames = 32, 24, 12
    for i in range(8):
        rng = np.random.default_rng(2000 + i)
        vid = rng.integers(0, 255, size=(frames, h, w), dtype=np.uint8)
        idxs = list(range(0, frames, 2))
        s = 0.0
        for idx in idxs:
            s += float(vid[idx].mean())
        rows.append(
            (
                f"vid_{i:06d}",
                len(idxs),
                _r(s / len(idxs), 6),
                len(idxs) * w * h,
            )
        )
    return _values_sql(
        [
            ("clip_id", "VARCHAR"),
            ("n_sampled", "BIGINT"),
            ("avg_frame_mean", "DOUBLE"),
            ("total_bytes", "BIGINT"),
        ],
        rows,
    )


@register("video_frame_sample_fp", _video_frames_oracle)
def video_frame_sample_fp(spark, sf_dir):
    """``video_frame_sample``'s oracle twin: UDTF frame fan-out +
    per-clip aggregate."""
    from .multimodal import video_frame_sample

    return video_frame_sample(spark, sf_dir)


# ---------------------------------------------------------------------------
# polygon zonal statistics
# ---------------------------------------------------------------------------

# the zonal_stats_poly_q fixture polygons (operators/spatial_queries.py),
# replicated literally: one convex, one reflex ring in scene meters
_POLYS = {
    "tri": np.array(
        [[601000, 5089000], [640000, 5089000], [620000, 5096000]], dtype=float
    ),
    "ell": np.array(
        [
            [660000, 5089500], [680000, 5089500], [680000, 5092000],
            [670000, 5092000], [670000, 5094500], [660000, 5094500],
        ],
        dtype=float,
    ),
}


def _zonal_poly_oracle() -> str:
    """Center-in-polygon replay over the 48-scene merged canvases: the
    interior metadata path and the boundary ray-cast path both reduce to
    masking each STORED canvas by its pixel centers (an interior tile's
    mask is all-true by construction), so one masked pass replays both.
    All sums are integer-valued doubles < 2^53 — order-independent."""
    from ..functions import geometry as G
    from .replay import merged_canvases

    TILE_PX, PX_M = 256, 10
    tile_m = TILE_PX * PX_M
    cv = merged_canvases(48)
    cols = (np.arange(TILE_PX) + 0.5) * PX_M
    rws = (np.arange(TILE_PX) + 0.5) * PX_M
    acc: dict[tuple, tuple[int, float]] = {}
    for (var, tx, ty), canvas in cv.items():
        xs = tx * tile_m + cols
        ys = (ty + 1) * tile_m - rws
        gx, gy = np.meshgrid(xs, ys)
        for zid, poly in _POLYS.items():
            mask = G.points_in_polygon(gx.ravel(), gy.ravel(), poly).reshape(
                TILE_PX, TILE_PX
            )
            if not mask.any():
                continue
            n, s = acc.get((zid, var), (0, 0.0))
            acc[(zid, var)] = (
                n + int(mask.sum()),
                s + float(canvas[mask].astype(np.float64).sum()),
            )
    rows = [
        (z, v, n, s, _r(s / n, 6)) for (z, v), (n, s) in sorted(acc.items())
    ]
    return _values_sql(
        [
            ("zone_id", "VARCHAR"),
            ("var", "VARCHAR"),
            ("n_px", "BIGINT"),
            ("px_sum", "DOUBLE"),
            ("px_mean", "DOUBLE"),
        ],
        rows,
    )


@register("zonal_stats_poly_fp", _zonal_poly_oracle)
def zonal_stats_poly_fp(spark, sf_dir):
    """``zonal_stats_poly``'s oracle twin: interior-metadata +
    boundary-ray-cast two-path plan vs the sequential masked replay."""
    from .spatial_queries import zonal_stats_poly_q

    return zonal_stats_poly_q(spark, sf_dir)
