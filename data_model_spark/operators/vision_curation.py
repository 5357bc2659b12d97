"""Web-corpus image-curation ops: blur detection, CLIP-score filtering,
exact byte-level image dedup.

The three standard pre-training filters (LAION-5B / DataComp recipes)
that sit between the raw image+caption crawl and every downstream stage:

* ``blur_scores_fp`` — low-information / blur detection by the variance
  of the discrete 5-point Laplacian (the OpenCV ``variance_of_laplacian``
  sharpness test), computed EXACTLY in integers over real decoded bytes.
  Each fixture image is scored twice — as stored, and after an exact
  integer 3x3 box blur — so the fixture proves the detector separates the
  populations (reflectance originals ~1.0e7 variance vs ~2.1e5 blurred vs
  ~1e2-1e4 class masks; threshold 1e6 calibrated on the real kernels).
  The sharp verdict uses the cross-multiplied test
  ``n*ss - s*s > T*n*n`` evaluated in Python arbitrary-precision ints:
  |L| <= 20000 at the 5000 reflectance cap, so at 512x512 the worst-case
  n*ss reaches ~2.7e19 — past int64 — while the REPORTED columns
  n_pix/lap_sq stay well inside it (lap_sq <= 1.1e14).
  Per-row mapInPandas work, zero shuffles beyond the scan.

* ``crossmodal_filter`` — the CLIP-score gate: cosine similarity between
  each pair's image embedding and caption embedding, keep at the
  published LAION threshold 0.28.  Embedding pairs are derived from the
  embeddings table with a deterministic id rule (vec_id % 3 == 0 ->
  self-pair, cosine 1.0 = aligned caption; else the XOR-1 neighbour =
  mismatched caption), giving a non-trivial split (167 aligned + 3
  above-threshold neighbours of 500 at sf0.01).  Cosine is JVM-side
  (``zip_with``/``aggregate`` — no Python in the hot path); at corpus
  scale the pair table arrives pre-joined (img_emb, txt_emb per row), so
  the op is a pure scan; the fixture's id-equi-join stands in for that
  materialization and is a single hash shuffle.

* ``image_exact_dups`` — exact duplicate detection on the BINARY image
  column: group by ``md5(bytes)``, emit groups with >= 2 members.  The
  fixture plants 12 byte-identical copies (every 4th image re-encoded
  under a new image_id from the same pixels) among 48 originals.  One
  shuffle on the 16-byte digest; per-group state is bounded by duplicate
  multiplicity, so ``collect_list`` of the member ids is safe at any
  corpus size (the LAION dedup shape: url/byte-hash groups are tiny).

* ``aspect_bucket_stats`` — SDXL-style aspect-ratio bucketing for batch
  packing: each image is assigned to the nearest of a 7-rung ratio
  ladder by an EXACT integer argmin (cross-multiplied distances, one
  LCM-scaled comparable key — no float, no log), computed as a fold over
  a literal struct array: a pure per-row expression, ZERO shuffles for
  the assignment and a 7-group rollup after it.  The oracle regenerates
  the meta table in SQL from ``range(N)`` (the dim cycle is pure index
  arithmetic) and replays the identical argmin.

* ``exposure_stats_fp`` — over/under-exposure QA: exact pixel-tail
  counts at the band clip points over real decoded bytes, verdict by
  cross-multiplied tail fractions (< 10% clipped each side).  Class and
  probability masks are correctly flagged as clipped populations.

Reference context: the reference validates image payloads band-by-band
(`conversion/geozarr.py:974-1183`) but has no corpus-curation layer;
these extend the decode-fingerprint evidence pattern (``augment_fp``,
``image_features_fp``) to the filtering ops a 10^12-image table needs.

Oracles: ``crossmodal_filter`` is a full DuckDB SQL twin over the same
parquet (scales with sf_dir); the two fixture ops use sequential replay
VALUES (the ``zonal_stats_fp`` pattern) — the replay re-derives
bytes/pixels from image_id exactly as the generator does, so a driver
hash match proves decode + kernel + grouping end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
from .similarity import cosine_expr

N_IMG = 48
DUP_STRIDE = 4  # every 4th image gets a planted byte-identical copy
LAP_VAR_T = 1_000_000  # sharpness threshold (calibrated, see module doc)
CLIP_T = 0.28  # published LAION-5B CLIP-score gate


# ---------------------------------------------------------------------------
# blur / low-information detection
# ---------------------------------------------------------------------------


def box3_np(a: np.ndarray) -> np.ndarray:
    """Exact integer 3x3 box blur, valid mode: (h, w) -> (h-2, w-2)."""
    s = (
        a[:-2, :-2] + a[:-2, 1:-1] + a[:-2, 2:]
        + a[1:-1, :-2] + a[1:-1, 1:-1] + a[1:-1, 2:]
        + a[2:, :-2] + a[2:, 1:-1] + a[2:, 2:]
    )
    return s // 9


def lap_stats_np(a: np.ndarray) -> tuple[int, int, bool]:
    """(n_interior, sum(L^2), sharp) for the 5-point Laplacian.

    The verdict cross-multiplies in Python ints: population variance
    n*ss - s*s > T*n*n without division or float error.
    """
    L = (
        4 * a[1:-1, 1:-1]
        - a[:-2, 1:-1] - a[2:, 1:-1] - a[1:-1, :-2] - a[1:-1, 2:]
    )
    n = int(L.size)
    s = int(L.sum())
    ss = int((L * L).sum())
    return n, ss, n * ss - s * s > LAP_VAR_T * n * n


def _blur_rows(image_id: str, a: np.ndarray) -> list[tuple]:
    rows = []
    for variant, arr in (("orig", a), ("blur", box3_np(a))):
        n, ss, sharp = lap_stats_np(arr)
        rows.append((image_id, variant, n, ss, sharp))
    return rows


def blur_scores(images: DataFrame) -> DataFrame:
    """(image_id, variant, n_pix, lap_sq, sharp) per image x {orig, blur}."""
    from ..codecs import decode_image

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = decode_image(r.bytes, r.fmt, r.w, r.h).astype(np.int64)
                rows.extend(_blur_rows(r.image_id, a))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "variant", "n_pix", "lap_sq", "sharp"],
                )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel,
        "image_id string, variant string, n_pix bigint, lap_sq bigint,"
        " sharp boolean",
    )


def _decoded(i: int) -> np.ndarray:
    from ..codecs import decode_image, encode_image
    from ..sources import images as img

    w, h = img.image_dims(i)
    fmt = img.image_fmt(i)
    raw = img.synth_pixels(f"img_{i:012d}", w, h)
    return decode_image(encode_image(raw, fmt), fmt, w, h).astype(np.int64)


def _blur_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for i in range(N_IMG):
        rows.extend(_blur_rows(f"img_{i:012d}", _decoded(i)))
    return _values_sql(
        [("image_id", "VARCHAR"), ("variant", "VARCHAR"),
         ("n_pix", "BIGINT"), ("lap_sq", "BIGINT"), ("sharp", "BOOLEAN")],
        rows,
    )


@register("blur_scores_fp", _blur_oracle)
def blur_scores_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplacian-variance sharpness verdicts over real decoded bytes,
    each image scored as stored and after an exact 3x3 box blur."""
    from ..sources.images import generate_images_df

    return blur_scores(generate_images_df(spark, N_IMG))


# ---------------------------------------------------------------------------
# CLIP-score cross-modal filter
# ---------------------------------------------------------------------------


def crossmodal_scores(emb: DataFrame, threshold: float = CLIP_T) -> DataFrame:
    """(vec_id, txt_id, clip_score, kept) — cosine gate at ``threshold``."""
    pairs = emb.select(
        "vec_id",
        F.col("embedding").alias("img_emb"),
        F.expr(
            "CASE WHEN vec_id % 3 = 0 THEN vec_id"
            " ELSE CAST(vec_id ^ 1 AS BIGINT) END"
        ).alias("txt_id"),
    )
    txt = emb.select(
        F.col("vec_id").alias("txt_id"), F.col("embedding").alias("txt_emb")
    )
    return (
        pairs.join(txt, "txt_id")
        .select(
            "vec_id",
            "txt_id",
            F.round(cosine_expr("img_emb", "txt_emb"), 6).alias("clip_score"),
        )
        .withColumn("kept", F.col("clip_score") >= F.lit(threshold))
    )


_CROSSMODAL_ORACLE = f"""WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
pairs AS (
  SELECT vec_id, e AS img_e,
         CASE WHEN vec_id % 3 = 0 THEN vec_id
              ELSE xor(vec_id, 1) END AS txt_id
  FROM emb)
SELECT p.vec_id, p.txt_id,
       ROUND(list_cosine_similarity(p.img_e, t.e), 6) AS clip_score,
       ROUND(list_cosine_similarity(p.img_e, t.e), 6) >= {CLIP_T} AS kept
FROM pairs p JOIN emb t ON t.vec_id = p.txt_id"""


@register("crossmodal_filter", _CROSSMODAL_ORACLE)
def crossmodal_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLIP-score gate over the embeddings table at the LAION 0.28
    threshold; deterministic aligned/mismatched caption pairing."""
    return crossmodal_scores(
        load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    )


# ---------------------------------------------------------------------------
# exact byte-level image dedup
# ---------------------------------------------------------------------------


def _dup_indices(n: int = N_IMG, stride: int = DUP_STRIDE) -> list[int]:
    return list(range(0, n, stride))


def _dup_bytes(i: int) -> bytes:
    from ..codecs import encode_image
    from ..sources import images as img

    w, h = img.image_dims(i)
    fmt = img.image_fmt(i)
    return encode_image(img.synth_pixels(f"img_{i:012d}", w, h), fmt)


def planted_dups_df(spark: SparkSession) -> DataFrame:
    """12 byte-identical copies of every 4th fixture image under new ids,
    generated distributively (spark.range -> mapInPandas encode)."""

    def gen(batches):
        for pdf in batches:
            idx = pdf["id"].to_numpy()
            if len(idx):
                yield pd.DataFrame(
                    {
                        "image_id": [f"dup_{int(i):012d}" for i in idx],
                        "bytes": [_dup_bytes(int(i)) for i in idx],
                    }
                )

    return spark.range(0, N_IMG, DUP_STRIDE, numPartitions=4).mapInPandas(
        gen, "image_id string, bytes binary"
    )


def exact_dup_groups(images: DataFrame) -> DataFrame:
    """(sig, n_copies, ids) for every byte-identical group of >= 2 images.

    One shuffle on the md5 digest; collect_list holds only the group's
    members (bounded by duplicate multiplicity, not corpus size).
    """
    return (
        images.select("image_id", F.md5("bytes").alias("sig"))
        .groupBy("sig")
        .agg(
            F.count("*").alias("n_copies"),
            F.concat_ws(",", F.sort_array(F.collect_list("image_id"))).alias(
                "ids"
            ),
        )
        .filter(F.col("n_copies") >= 2)
    )


def _dups_oracle() -> str:
    from .mosaic_fp import _values_sql

    groups: dict[str, list[str]] = {}
    for i in range(N_IMG):
        sig = hashlib.md5(_dup_bytes(i)).hexdigest()
        groups.setdefault(sig, []).append(f"img_{i:012d}")
    for i in _dup_indices():
        sig = hashlib.md5(_dup_bytes(i)).hexdigest()
        groups[sig].append(f"dup_{i:012d}")
    rows = [
        (sig, len(ids), ",".join(sorted(ids)))
        for sig, ids in groups.items()
        if len(ids) >= 2
    ]
    return _values_sql(
        [("sig", "VARCHAR"), ("n_copies", "BIGINT"), ("ids", "VARCHAR")],
        rows,
    )


@register("image_exact_dups", _dups_oracle)
def image_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical duplicate groups over the fixture + 12 planted
    copies; md5-group shuffle, group state bounded by multiplicity."""
    from ..sources.images import generate_images_df

    base = generate_images_df(spark, N_IMG).select("image_id", "bytes")
    return exact_dup_groups(base.unionByName(planted_dups_df(spark)))


# ---------------------------------------------------------------------------
# aspect-ratio bucketing (batch-packing prep)
# ---------------------------------------------------------------------------

#: SDXL-style bucket ladder: (name, bw, bh) ratio anchors.  Assignment is
#: the EXACT integer argmin of |w/h - bw/bh|: cross-multiplying removes
#: both denominators — |w*bh - h*bw| / (h*bh) vs another bucket's distance
#: compares as |w*bh1 - h*bw1| * bh2  <>  |w*bh2 - h*bw2| * bh1 (h cancels),
#: so scaling each bucket's numerator by LCM(bh)/bh = 144/bh yields one
#: integer key comparable across the whole ladder.  No float, no log.
ASPECT_BUCKETS: list[tuple[str, int, int]] = [
    ("square", 1, 1),
    ("landscape_4_3", 4, 3),
    ("portrait_3_4", 3, 4),
    ("wide_16_9", 16, 9),
    ("tall_9_16", 9, 16),
    ("pano_2_1", 2, 1),
    ("column_1_2", 1, 2),
]
_BH_LCM = 144
N_ASPECT = 4096  # meta-only fixture rows (dims derived, no pixel synthesis)


def with_aspect_bucket(meta: DataFrame) -> DataFrame:
    """Adds ``bucket``: exact nearest-ratio ladder assignment, JVM-side.

    The argmin is a fold over a 7-element literal struct array — pure
    per-row expression work, ZERO shuffles: at 10^12 rows this column is
    free (no broadcast join, no window)."""
    candidates = F.array(
        *[
            F.struct(
                (
                    F.abs(F.col("w") * F.lit(bh) - F.col("h") * F.lit(bw))
                    * F.lit(_BH_LCM // bh)
                ).cast("bigint").alias("key"),
                F.lit(idx).alias("idx"),
                F.lit(name).alias("name"),
            )
            for idx, (name, bw, bh) in enumerate(ASPECT_BUCKETS)
        ]
    )
    best = F.aggregate(
        candidates,
        F.struct(
            F.lit(2**62).cast("bigint").alias("key"),
            F.lit(-1).alias("idx"),
            F.lit("").alias("name"),
        ),
        lambda acc, x: F.when(
            (x["key"] < acc["key"])
            | ((x["key"] == acc["key"]) & (x["idx"] < acc["idx"])),
            x,
        ).otherwise(acc),
    )
    return meta.withColumn("bucket", best["name"])


def aspect_bucket_rollup(meta: DataFrame) -> DataFrame:
    """(bucket, n_images, px_sum) per ladder bucket — one 7-group shuffle."""
    return (
        with_aspect_bucket(meta)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(F.col("w").cast("bigint") * F.col("h")).alias("px_sum"),
        )
    )


def _aspect_oracle() -> str:
    """Fully derived SQL twin: the dim cycle w = c[i%3], h = c[(i//3)%3]
    is pure index arithmetic, so DuckDB regenerates the meta table from
    ``range(N)`` and replays the identical integer argmin."""
    from ..sources.images import DIM_CYCLE

    c = DIM_CYCLE
    buckets = ", ".join(
        f"('{name}', {bw}, {bh}, {idx})"
        for idx, (name, bw, bh) in enumerate(ASPECT_BUCKETS)
    )
    return f"""WITH meta AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN {c[0]} WHEN 1 THEN {c[1]} ELSE {c[2]} END AS w,
         CASE (i // 3) % 3 WHEN 0 THEN {c[0]} WHEN 1 THEN {c[1]} ELSE {c[2]} END AS h
  FROM range({N_ASPECT}) t(i)),
b(name, bw, bh, idx) AS (VALUES {buckets}),
keyed AS (
  SELECT m.i, m.w, m.h, b.name,
         ROW_NUMBER() OVER (
           PARTITION BY m.i
           ORDER BY abs(m.w * b.bh - m.h * b.bw) * ({_BH_LCM} // b.bh), b.idx
         ) AS rn
  FROM meta m CROSS JOIN b)
SELECT name AS bucket, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(w::BIGINT * h) AS BIGINT) AS px_sum
FROM keyed WHERE rn = 1 GROUP BY name"""


@register("aspect_bucket_stats", _aspect_oracle())
def aspect_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer aspect-ratio ladder assignment (shuffle-free column)
    + per-bucket rollup over the 4096-row derived meta table."""
    from ..sources.images import generate_images_meta_df

    return aspect_bucket_rollup(
        generate_images_meta_df(spark, N_ASPECT).select("image_id", "w", "h")
    )


# ---------------------------------------------------------------------------
# exposure / clipping QA
# ---------------------------------------------------------------------------

EXP_LOW_T = 600  # at-or-below: underexposed pixel
EXP_HIGH_T = 3900  # at-or-above: overexposed pixel
EXP_MAX_FRAC = (1, 10)  # well-exposed iff each tail holds < 1/10 of pixels


def exposure_stats_np(a: np.ndarray) -> tuple[int, int, int, int, bool]:
    """(n, n_low, n_high, px_sum, well_exposed) — exact integers; the
    verdict cross-multiplies the tail fractions (num/den), no floats."""
    n = int(a.size)
    n_low = int((a <= EXP_LOW_T).sum())
    n_high = int((a >= EXP_HIGH_T).sum())
    num, den = EXP_MAX_FRAC
    well = n_low * den < n * num and n_high * den < n * num
    return n, n_low, n_high, int(a.sum()), well


def exposure_stats(images: DataFrame) -> DataFrame:
    from ..codecs import decode_image

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = decode_image(r.bytes, r.fmt, r.w, r.h).astype(np.int64)
                rows.append((r.image_id, *exposure_stats_np(a)))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "n_pix", "n_low", "n_high",
                             "px_sum", "well_exposed"],
                )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel,
        "image_id string, n_pix bigint, n_low bigint, n_high bigint,"
        " px_sum bigint, well_exposed boolean",
    )


def _exposure_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = [
        (f"img_{i:012d}", *exposure_stats_np(_decoded(i)))
        for i in range(N_IMG)
    ]
    return _values_sql(
        [("image_id", "VARCHAR"), ("n_pix", "BIGINT"), ("n_low", "BIGINT"),
         ("n_high", "BIGINT"), ("px_sum", "BIGINT"),
         ("well_exposed", "BOOLEAN")],
        rows,
    )


@register("exposure_stats_fp", _exposure_oracle)
def exposure_stats_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clipping/exposure QA over real decoded bytes: exact tail counts at
    the band clip points + cross-multiplied well-exposed verdict (class
    and probability masks are correctly flagged as clipped)."""
    from ..sources.images import generate_images_df

    return exposure_stats(generate_images_df(spark, N_IMG))


# ---------------------------------------------------------------------------
# information-content (entropy) gate
# ---------------------------------------------------------------------------

ENT_MIN_MBITS = 3000  # keep-gate: >= 3.000 bits of 8-bit histogram entropy
ENT_MIN_LEVELS = 16  # and at least 16 distinct gray levels


def entropy_stats_np(a: np.ndarray) -> tuple[int, int, int, int, bool]:
    """(n_pix, n_levels, modal_count, ent_mbits, keep) on the 8-bit image.

    Shannon entropy of the 256-bin histogram in millibits, computed as
    ``round(1000 * (log2(n) - sum(c*log2(c))/n))`` — the exact-rational
    form log2(n) - H avoids catastrophic cancellation and the replay
    recomputes the identical double expression, so the integer millibit
    value is deterministic across engines.  Flat ramps / constant masks
    score low; textured reflectance scenes score high.
    """
    hist = np.bincount(a.reshape(-1), minlength=256)
    n = int(a.size)
    nz = hist[hist > 0].astype(np.float64)
    ent_bits = float(np.log2(n) - (nz * np.log2(nz)).sum() / n)
    mbits = int(np.floor(ent_bits * 1000 + 0.5))
    n_levels = int((hist > 0).sum())
    modal = int(hist.max())
    keep = mbits >= ENT_MIN_MBITS and n_levels >= ENT_MIN_LEVELS
    return n, n_levels, modal, mbits, keep


def entropy_stats(images: DataFrame) -> DataFrame:
    """Histogram-entropy information gate over real decoded bytes."""
    from ..codecs import decode_image

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = decode_image(r.bytes, r.fmt, r.w, r.h)
                rows.append(
                    (r.image_id, *entropy_stats_np((a >> 8).astype(np.uint8)))
                )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["image_id", "n_pix", "n_levels", "modal_count",
                             "ent_mbits", "keep"],
                )

    return images.select("image_id", "bytes", "fmt", "w", "h").mapInPandas(
        kernel,
        "image_id string, n_pix bigint, n_levels bigint, modal_count bigint,"
        " ent_mbits bigint, keep boolean",
    )


def _entropy_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for i in range(N_IMG):
        a = _decoded(i).astype(np.uint16)
        rows.append(
            (f"img_{i:012d}", *entropy_stats_np((a >> 8).astype(np.uint8)))
        )
    return _values_sql(
        [("image_id", "VARCHAR"), ("n_pix", "BIGINT"), ("n_levels", "BIGINT"),
         ("modal_count", "BIGINT"), ("ent_mbits", "BIGINT"),
         ("keep", "BOOLEAN")],
        rows,
    )


@register("entropy_gate_fp", _entropy_oracle)
def entropy_gate_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-content gate: 8-bit histogram entropy in exact
    millibits over real decoded bytes; low-entropy (flat / mask / junk)
    images are dropped, textured scenes kept."""
    from ..sources.images import generate_images_df

    return entropy_stats(generate_images_df(spark, N_IMG))
