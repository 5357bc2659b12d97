"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch, ACL 2016).

The missing half of the shipped BPE-ish *tokenization* (``text.token_count_bpe``
segments with a fixed pre-tokenizer): actually LEARNING the merge table
from the corpus.  Classic algorithm: represent each vocabulary word as a
symbol sequence (characters + ``</w>`` end marker) weighted by corpus
frequency; repeat K times { count adjacent symbol pairs, merge the most
frequent pair everywhere (leftmost-first within a word) }.

Spark shape: the corpus collapses to a (word, count) vocabulary first —
one hash aggregation over the token explode, the standard trick that
makes each merge iteration O(|vocab|), not O(corpus).  Each iteration is
then one JVM pair-explode + one map-side-combinable count aggregation;
only the single winning pair is collected per round (same driver-loop
contract as ``ivf_kmeans``: k rows per iteration, never data).  The
merge itself is a pure JVM ``aggregate`` fold over the symbol array —
leftmost-first non-overlapping, matching the reference implementation —
so no Python UDF touches the hot path.  ``localCheckpoint`` truncates
the per-iteration lineage like ``operators/pagerank.py``.

Determinism: ties on pair count break lexicographically (left, then
right) — bit-identical merge tables at any parallelism.  Iterative +
data-dependent => rows-only registered query; exactness is pinned by the
pure-Python reference equality in ``tests/test_bpe.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..sources.tables import load_table
from .registry import register

END = "</w>"


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(a: str, b: str) -> str:
    """Fold s -> s with every leftmost-first adjacent (a, b) fused."""
    qa, qb, qab = _sql_quote(a), _sql_quote(b), _sql_quote(a + b)
    return (
        f"aggregate(slice(s, 2, size(s) - 1), array(element_at(s, 1)),"
        f" (acc, x) -> IF(element_at(acc, -1) = {qa} AND x = {qb},"
        f" concat(slice(acc, 1, size(acc) - 1), array({qab})),"
        f" concat(acc, array(x))))"
    )


def bpe_train(docs: DataFrame, n_merges: int = 20) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns
    [(left, right, pair_count), ...] in merge order.  Stops early when no
    pair occurs twice."""
    words = (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), " +")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    # scale-adaptive vocabulary collapse: BPE training operates on the
    # distinct-word vocabulary, which is orders of magnitude smaller than
    # the corpus.  When it fits the bounded-collect budget, run the merge
    # loop driver-side with the SAME kernel the pytest pins equal to the
    # distributed trainer — one job instead of ~2-3 jobs per merge round.
    # Above the cap the distributed loop below runs unchanged.
    import os as _os

    small = int(_os.environ.get("DMS_BPE_SMALL_VOCAB", "8192"))
    probe = words.limit(small + 1).collect()
    if len(probe) <= small:
        return _ref_bpe_vocab({r["w"]: int(r["cnt"]) for r in probe}, n_merges)
    syms = words.select(
        "cnt",
        F.expr(
            f"concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
            f" array({_sql_quote(END)}))"
        ).alias("s"),
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            syms.filter(F.size("s") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.desc("n"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0].n < 2:
            break
        l, r, n = top[0].l, top[0].r, int(top[0].n)
        merges.append((l, r, n))
        syms = syms.select("cnt", F.expr(_merge_expr(l, r)).alias("s")).localCheckpoint()
    return merges


def _ref_bpe_vocab(vocab: dict, n_merges: int):
    """Merge loop over a (word -> count) vocabulary — the shared
    sequential kernel (identical picks and tie-breaks to the distributed
    trainer, pinned by tests/test_bpe.py)."""
    from collections import Counter

    seqs = {w: list(w) + [END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, s in seqs.items():
            c = vocab[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        # max count, ties lexicographic on (left, right)
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((l, r, n))
        for w, s in seqs.items():
            out = [s[0]]
            for x in s[1:]:
                if out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            seqs[w] = out
    return merges


def ref_bpe(texts, n_merges):
    """Sequential Sennrich reference (shared kernel: the pytest equality
    check and the ``bpe_train_fp`` oracle both replay through this)."""
    import re
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in re.split(" +", t.strip().lower()):
            if w:
                vocab[w] += 1
    return _ref_bpe_vocab(vocab, n_merges)


@register("bpe_train_merges", None)  # iterative; reference equality in tests/test_bpe.py
def bpe_train_merges(spark, sf_dir):
    """First 20 BPE merges learned from the document corpus: (rank, left,
    right, pair_count).  Rows-only — the merge loop is data-dependent
    iteration; tests/test_bpe.py proves merge-table equality with the
    pure-Python Sennrich reference on the same corpus."""
    merges = bpe_train(load_table(spark, sf_dir, "documents"), n_merges=20)
    rows = [(i, l, r, n) for i, (l, r, n) in enumerate(merges)]
    from ..sources.tables import local_df

    return local_df(spark, rows, "rank int, left string, right string, pair_count long")


# ---------------------------------------------------------------------------
# oracle twin on a seeded sf-independent fixture (the traj_simplify_fp
# pattern: the SAME distributed trainer over a deterministic corpus,
# hash-checked against the sequential ref_bpe replay)
# ---------------------------------------------------------------------------

# Sennrich's own worked example vocabulary, extended so merged symbols
# keep participating in later merges (cascading multi-char units) and
# tie-breaks actually fire; doc i carries word j iff (i*7 + j*j) % 4 < 2
# — a fixed arithmetic schedule, so Python and Spark see byte-identical
# texts without any RNG.
_FIX_WORDS = [
    "low", "lower", "lowest", "new", "newer", "newest", "wide", "wider",
    "widest", "bananas", "banana", "bandana", "abab", "ababab",
]
_FIX_DOCS = 48
_FIX_MERGES = 16


def _fixture_texts() -> list[str]:
    return [
        " ".join(
            w for j, w in enumerate(_FIX_WORDS) if (i * 7 + j * j) % 4 < 2
        )
        for i in range(_FIX_DOCS)
    ]


def _bpe_fp_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = [
        (i, l, r, n)
        for i, (l, r, n) in enumerate(ref_bpe(_fixture_texts(), _FIX_MERGES))
    ]
    # lhs/rhs, not left/right: those are reserved words in DuckDB's parser
    return _values_sql(
        [
            ("rank", "INTEGER"),
            ("lhs", "VARCHAR"),
            ("rhs", "VARCHAR"),
            ("pair_count", "BIGINT"),
        ],
        rows,
    )


@register("bpe_train_fp", _bpe_fp_oracle)
def bpe_train_fp(spark, sf_dir):
    """``bpe_train_merges``'s oracle twin: the identical iterative
    pair-count/merge plan (JVM pair explode + fold, one winner collected
    per round) over the seeded fixture corpus, hash-checked against the
    sequential Sennrich replay."""
    from ..sources.tables import local_df

    docs = local_df(
        spark,
        [(i, t) for i, t in enumerate(_fixture_texts())],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=_FIX_MERGES)
    rows = [(i, l, r, n) for i, (l, r, n) in enumerate(merges)]
    return local_df(spark, rows, "rank int, lhs string, rhs string, pair_count long")


# ---------------------------------------------------------------------------
# BPE ENCODE: apply a trained merge table (the other half of Sennrich —
# tokenize the corpus with the learned vocabulary)
# ---------------------------------------------------------------------------


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str, int]]) -> DataFrame:
    """Tokenize distinct words with trained merges: (w) -> (w, tokens).

    Encoding = the training-time merge procedure replayed in RANK ORDER
    (each merge fused leftmost-first) — the published algorithm's apply
    step.  Expressed as one chained JVM ``aggregate`` fold per merge over
    the symbol array: a single narrow projection, no Python, no shuffle.

    100 TB shape: call this on the DISTINCT-word vocabulary (the same
    collapse the trainer uses), then broadcast/equi-join tokens back to
    the exploded corpus — encode cost is O(|vocab|), not O(corpus).
    """
    df = words.select(
        "w",
        F.expr(
            f"concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)),"
            f" array({_sql_quote(END)}))"
        ).alias("s"),
    )
    for i, (l, r, _n) in enumerate(merges):
        df = df.select("w", F.expr(_merge_expr(l, r)).alias("s"))
        if (i + 1) % 4 == 0:
            # cap expression-tree growth: CollapseProject would inline the
            # multiply-referenced `s` across folds (4 refs/merge -> 4^k
            # blowup); a checkpoint every 4 merges keeps the analyzed plan
            # bounded while the vocab table stays tiny (post-collapse)
            df = df.localCheckpoint()
    return df.select("w", F.col("s").alias("tokens"))


def ref_encode(word: str, merges) -> list[str]:
    """Sequential apply replay (shared by pytest and the oracle)."""
    s = list(word) + [END]
    for l, r, _n in merges:
        out = [s[0]]
        for x in s[1:]:
            if out[-1] == l and x == r:
                out[-1] = l + r
            else:
                out.append(x)
        s = out
    return s


def _bpe_encode_oracle() -> str:
    from .mosaic_fp import _values_sql

    merges = ref_bpe(_fixture_texts(), _FIX_MERGES)
    words = sorted({w for t in _fixture_texts() for w in t.split() if w})
    rows = []
    for w in words:
        toks = ref_encode(w, merges)
        rows.append((w, len(toks), " ".join(toks)))
    return _values_sql(
        [("w", "VARCHAR"), ("n_tokens", "INTEGER"), ("tokens", "VARCHAR")],
        rows,
    )


@register("bpe_encode_tokens", _bpe_encode_oracle)
def bpe_encode_tokens(spark, sf_dir):
    """Train on the seeded fixture, then ENCODE its vocabulary with the
    learned merges — (word, token count, space-joined tokens), the full
    train->apply loop hash-checked against the sequential replay."""
    from ..sources.tables import local_df

    docs = local_df(
        spark,
        [(i, t) for i, t in enumerate(_fixture_texts())],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=_FIX_MERGES)
    words = (
        docs.select(F.explode(F.split(F.trim(F.lower("text")), " +")).alias("w"))
        .filter(F.length("w") > 0)
        .distinct()
    )
    enc = bpe_encode_words(words, merges)
    return enc.select(
        "w",
        F.size("tokens").cast("int").alias("n_tokens"),
        F.array_join("tokens", " ").alias("tokens"),
    )
