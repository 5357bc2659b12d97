"""JPEG recompression QA: estimate encode quality from the real DQT bytes.

Web-crawl curation pipelines gate on *encoder quality*: an image that was
last saved at IJG quality < 50 has already lost most high-frequency
content and is a poor training sample regardless of resolution (the
DataComp/LAION "image quality" axis).  Quality is not stored anywhere in
the file — it must be recovered from the quantization tables the encoder
embedded, exactly how `identify -verbose` / ImageMagick's quality heuristic
works: walk the JFIF markers to the DQT segment (T.81 B.2.4.1), de-zigzag
the 64 entries, and invert the IJG scaling of the Annex K.1 luminance
table (`codecs/jpeg.py:quant_table` — the scaling every libjpeg build
ships).  Because the IJG map quality -> table is a pure function, the
inverse is an exact 100-candidate table match, not a curve fit; ties
(possible at the clipped extremes) resolve to the smallest quality, which
is the conservative verdict for a keep-gate.

Fixture: each of the ``N_IMG`` synthetic images is re-encoded at a known
per-index quality ``q_i = 25 + (i * 13) % 71`` (covers 25..95 across the
format/band cycle), then the estimator runs on the REAL encoded bytes —
so a driver hash match proves marker walk + de-zigzag + inverse scaling
end to end, and ``est_q == true_q`` for every row proves the inversion is
exact, not approximate.

Scale shape: the whole operator is one ``mapInPandas`` over the image
table — zero shuffles, and the estimator itself reads only the file
HEADER (the marker walk stops at the first DQT, ~0.7 KB in), so at
10^12 images the gate is a header-scan, not a decode.  The fixture
re-encode exists only to manufacture bytes with known ground truth; a
production run applies ``estimate_rows`` straight to the stored bytes.

Reference context: the reference validates payload encodings per band
(`conversion/geozarr.py:974-1183`) but never inspects codec parameters;
this is the curation-side extension of that validation idea.

Oracle: driver-side sequential replay of the identical kernel (the
``blur_scores_fp`` pattern) emitted as a VALUES table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..codecs.jpeg import ZIGZAG, encode_jpeg_gray8, quant_table
from .registry import register

N_IMG = 48
KEEP_Q = 50  # keep-gate: estimated quality >= 50


def true_quality(i: int) -> int:
    """Ground-truth re-encode quality for fixture image index i (25..95)."""
    return 25 + (i * 13) % 71


def parse_dqt(data: bytes) -> np.ndarray:
    """First DQT table from a baseline JFIF stream, natural (row) order.

    Marker walk per T.81 B.2: segments are (0xFF, marker, u16 length);
    stops at the first 0xDB segment's first 8-bit table.  Raises on
    streams with no DQT before SOS (not a baseline JPEG).
    """
    i = 2  # past SOI
    n = len(data)
    while i + 3 < n and data[i] == 0xFF:
        marker = data[i + 1]
        if marker == 0xDA:  # SOS — entropy data follows, no DQT seen
            break
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        if marker == 0xDB:
            pq_tq = data[i + 4]
            if pq_tq >> 4 != 0:
                raise ValueError("16-bit DQT unsupported (baseline is 8-bit)")
            zz = np.frombuffer(data[i + 5 : i + 69], dtype=np.uint8)
            nat = np.empty(64, dtype=np.int32)
            nat[ZIGZAG] = zz  # invert the zigzag the encoder applied
            return nat.reshape(8, 8)
        i += 2 + seg_len
    raise ValueError("no DQT segment found")


def estimate_quality(dqt: np.ndarray) -> int:
    """Exact IJG inverse: smallest quality whose table matches, else -1."""
    flat = np.asarray(dqt, dtype=np.int32).reshape(64)
    for q in range(1, 101):
        if np.array_equal(quant_table(q).reshape(64), flat):
            return q
    return -1


def _qa_row(image_id: str, i: int, img8: np.ndarray) -> tuple:
    tq = true_quality(i)
    data = encode_jpeg_gray8(img8, quality=tq)
    dqt = parse_dqt(data)
    est = estimate_quality(dqt)
    return (image_id, tq, est, int(dqt.sum()), bool(est >= KEEP_Q))


def jpeg_quality_rows(images: DataFrame) -> DataFrame:
    """(image_id, true_q, est_q, dqt_sum, keep) per image.

    Decode -> 8-bit -> re-encode at the per-index quality -> estimate from
    the produced bytes.  Pure per-row mapInPandas; no shuffle.
    """
    from ..codecs import decode_image
    from ..sources import images as img

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                i = img.image_index(r.image_id)
                a = decode_image(r.bytes, r.fmt, r.w, r.h)
                rows.append(_qa_row(r.image_id, i, (a >> 8).astype(np.uint8)))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "true_q", "est_q", "dqt_sum", "keep"],
                )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel,
        "image_id string, true_q int, est_q int, dqt_sum bigint, keep boolean",
    )


def _jpeg_qa_oracle() -> str:
    from .mosaic_fp import _values_sql
    from .vision_curation import _decoded

    rows = []
    for i in range(N_IMG):
        a = _decoded(i).astype(np.uint16)
        rows.append(_qa_row(f"img_{i:012d}", i, (a >> 8).astype(np.uint8)))
    return _values_sql(
        [("image_id", "VARCHAR"), ("true_q", "INTEGER"), ("est_q", "INTEGER"),
         ("dqt_sum", "BIGINT"), ("keep", "BOOLEAN")],
        rows,
    )


@register("jpeg_quality_fp", _jpeg_qa_oracle)
def jpeg_quality_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recover IJG encode quality from real DQT bytes for every fixture
    image (re-encoded at a known per-index quality) and apply the
    quality >= 50 keep-gate."""
    from ..sources.images import generate_images_df

    return jpeg_quality_rows(generate_images_df(spark, N_IMG))
