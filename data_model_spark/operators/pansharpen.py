"""Brovey pan-sharpening across co-keyed band scenes — integer-exact.

The Brovey transform (Gillespie et al. 1987) fuses a high-resolution
band into lower-resolution color bands by ratio scaling:

    out_i = band_i * sharp * 3 / (b + g + r)

Sentinel-2 practice uses the 10 m B08 as the sharpening band for the
visible trio — this fixture mirrors that: per scene, four co-registered
band arrays (b02/b03/b04 + b08) from the deterministic scene generator
(one geometry, four band channels — the L2A stack shape; the merged
MOSAIC fixture scatters bands across disjoint tiles, so the multiband
stack is generated per scene like `sources/images.py` does).

Exactness: the whole kernel is INTEGER arithmetic — HALF-UP rounding of
``num/den`` computes as ``floor((2*num + den) / (2*den))`` in int64, so
there is no floating point anywhere; pixels where the denominator is 0
emit 0, the `band_ndi` nodata convention.  Outputs clip to uint16.

Scale shape: a 4-way CO-KEYED equi-join of byte-carrying band tables on
scene_id — with a bucketed band store this is co-located and
shuffle-free; here each projection of the same generated table shuffles
once on the key (the `raster_math` argument; keys unique per side — no
skew, output = |scenes|).  Pixel work is one vectorized ``mapInPandas``
over the joined quads.  Emits per-(scene, band) integer fingerprints.
Oracle: direct-kernel replay VALUES (the ``mosaic_fp`` pattern).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codecs import decode_image, encode_image
from ..sources import images as img_src
from ..sources.tables import fixture_range
from .registry import register
from .upsample import _CK_MOD, _CK_MUL

N_SCENES = 24
BANDS = ("b02", "b03", "b04")
SHARP = "b08"
U16_MAX = 65535


def band_pixels(i: int, band: str) -> np.ndarray:
    """Band ``band`` of scene i — same geometry, band-salted seed."""
    w, h = img_src.image_dims(i)
    return img_src.synth_pixels(f"img_{i:012d}:{band}", w, h)


def brovey(bands: dict[str, np.ndarray], sharp: np.ndarray) -> dict[str, np.ndarray]:
    """HALF-UP integer Brovey: out_i = round(b_i * sharp * 3 / sum(bands))."""
    den = sum(b.astype(np.int64) for b in bands.values())
    out = {}
    for name, b in bands.items():
        num = b.astype(np.int64) * sharp.astype(np.int64) * 3
        v = np.where(den > 0, (2 * num + den) // np.maximum(2 * den, 1), 0)
        out[name] = np.minimum(v, U16_MAX)
    return out


def sharpen_features(bands: dict[str, np.ndarray], sharp: np.ndarray):
    """[(band, px_sum, px_max, ck)] fingerprints of one sharpened scene."""
    res = []
    for name, v in sorted(brovey(bands, sharp).items()):
        flat = v.ravel()
        idx = (np.arange(flat.size, dtype=np.int64) * _CK_MUL) % _CK_MOD
        ck = int(((flat % _CK_MOD) * idx % _CK_MOD).sum() % _CK_MOD)
        res.append((name, int(flat.sum()), int(flat.max()), ck))
    return res


def band_table(spark: SparkSession, band: str, n: int = N_SCENES) -> DataFrame:
    """(scene, w, h, d_<band>) byte-carrying band table."""
    import pandas as pd

    base = fixture_range(spark, n).select(F.col("id").alias("scene"))

    def gen(batches):
        for pdf in batches:
            recs = []
            for i in pdf["scene"].to_numpy():
                px = band_pixels(int(i), band)
                recs.append(
                    {
                        "scene": int(i),
                        "w": px.shape[1],
                        "h": px.shape[0],
                        f"d_{band}": encode_image(px, "raw-u16"),
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return base.mapInPandas(
        gen, f"scene long, w long, h long, d_{band} binary"
    )


def sharpen_scenes(spark: SparkSession, n: int = N_SCENES) -> DataFrame:
    joined = band_table(spark, BANDS[0], n)
    for v in (*BANDS[1:], SHARP):
        # every side is a byte-carrying table that GROWS with the data —
        # never a broadcast candidate (the canonical_docs lesson): pin
        # sort-merge so AQE cannot pick a driver-OOM broadcast at scale
        joined = joined.join(
            band_table(spark, v, n).drop("w", "h").hint("merge"), ["scene"]
        )

    def kern(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for row in pdf.itertuples(index=False):
                w, h = int(row.w), int(row.h)
                bands = {
                    v: decode_image(getattr(row, f"d_{v}"), "raw-u16", w, h)
                    for v in BANDS
                }
                sharp = decode_image(getattr(row, f"d_{SHARP}"), "raw-u16", w, h)
                for band, s, mx, ck in sharpen_features(bands, sharp):
                    recs.append(
                        {
                            "scene": int(row.scene),
                            "band": band,
                            "px_sum": s,
                            "px_max": mx,
                            "ck": ck,
                        }
                    )
            cols = ["scene", "band", "px_sum", "px_max", "ck"]
            yield pd.DataFrame.from_records(recs) if recs else pd.DataFrame(
                {c: pd.Series(dtype="object") for c in cols}
            )

    return joined.mapInPandas(
        kern, "scene long, band string, px_sum long, px_max long, ck long"
    )


def _sharpen_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for i in range(N_SCENES):
        bands = {b: band_pixels(i, b) for b in BANDS}
        for band, s, mx, ck in sharpen_features(bands, band_pixels(i, SHARP)):
            rows.append((i, band, s, mx, ck))
    return _values_sql(
        [
            ("scene", "BIGINT"),
            ("band", "VARCHAR"),
            ("px_sum", "BIGINT"),
            ("px_max", "BIGINT"),
            ("ck", "BIGINT"),
        ],
        rows,
    )


@register("brovey_sharpen_fp", _sharpen_oracle)
def brovey_sharpen_fp(spark, sf_dir):
    """Brovey-sharpened b02/b03/b04 fingerprints (B08 sharpening band)
    over the co-keyed 4-way band join — hash-checked against the
    sequential direct-kernel replay."""
    return sharpen_scenes(spark)
