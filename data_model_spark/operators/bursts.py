"""Kleinberg burst detection per term stream (Kleinberg, KDD 2002).

The trending-topic primitive: a two-state automaton over the gaps
between consecutive occurrences of a term — base state q0 emits gaps
at the stream's mean rate, burst state q1 at ``s`` times that rate;
entering the burst state costs ``gamma * ln n``; the minimum-cost
state sequence (Viterbi) marks the burst intervals.  In corpus
curation this screens scraped streams for event-driven duplication
spikes (the same story syndicated thousands of times in a burst
window) before near-dup thresholds are tuned on "normal" text.

Spark-first shape: gaps are sequential per term, so the DP runs in
``applyInPandas`` per term group — the engine's per-group-sequential
surface (DTW / map-match family): one shuffle on the term key, kernel
is vectorized-per-group NumPy, output one row per term.  The stream
fixture is deterministic and sf-independent (planted bursts at known
offsets), so the oracle is the direct-kernel replay VALUES (the
``solar`` pattern — identical libm for the two ``ln`` calls).

The DP cost arithmetic is plain float64; both engines run the SAME
NumPy kernel, so fingerprints are bit-identical.  At 10^12 events the
per-term work is O(n_occurrences); terms shard independently and the
heavy-tail term (a stopword) caps at the documented per-group memory
boundary shared with the DTW operator.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import fixture_range
from .registry import register
from .upsample import _CK_MOD, _CK_MUL

N_TERMS = 40
N_EVENTS = 80
BURST_LO, BURST_HI = 30, 46  # planted burst gap indices [lo, hi)
S_RATE = 2.0  # burst-state rate multiplier
GAMMA = 1.0  # state-entry cost coefficient


def term_times(k: int) -> np.ndarray:
    """Deterministic event times of term k with one planted burst."""
    gaps = np.full(N_EVENTS - 1, 10 + k % 7, np.float64)
    gaps[BURST_LO:BURST_HI] = 1 + k % 2
    return np.concatenate([[0.0], np.cumsum(gaps)])


def burst_states(times: np.ndarray, s: float = S_RATE, gamma: float = GAMMA):
    """Viterbi state sequence (0/1 per gap) of Kleinberg's 2-state
    automaton with exponential gap costs."""
    gaps = np.diff(times.astype(np.float64))
    n = gaps.size
    if n == 0:
        return np.zeros(0, np.int64)
    lam0 = n / float(gaps.sum())
    lam1 = s * lam0
    c0 = lam0 * gaps - math.log(lam0)
    c1 = lam1 * gaps - math.log(lam1)
    trans = gamma * math.log(n)
    INF = float("inf")
    cost = np.array([0.0, INF])
    back = np.zeros((n, 2), np.int64)
    for j in range(n):
        stay0, from1 = cost[0], cost[1]
        new0 = min(stay0, from1)  # 1 -> 0 is free
        back[j, 0] = 0 if stay0 <= from1 else 1
        up, stay1 = cost[0] + trans, cost[1]
        new1 = min(up, stay1)
        back[j, 1] = 1 if stay1 < up else 0
        cost = np.array([new0 + c0[j], new1 + c1[j]])
    st = np.zeros(n, np.int64)
    st[-1] = 0 if cost[0] <= cost[1] else 1
    for j in range(n - 1, 0, -1):
        st[j - 1] = back[j, st[j]]
    return st


def burst_summary(k: int) -> tuple[int, int, int]:
    """(n_bursts, n_burst_gaps, ck) for term k's stream."""
    st = burst_states(term_times(k))
    runs = int(((st[1:] == 1) & (st[:-1] == 0)).sum() + (st[:1] == 1).sum())
    idx = np.arange(st.size, dtype=np.int64)
    ck = int(((st * ((idx * _CK_MUL) % _CK_MOD)) % _CK_MOD).sum() % _CK_MOD)
    return runs, int(st.sum()), ck


def burst_terms(spark: SparkSession, n_terms: int = N_TERMS) -> DataFrame:
    """One row per term: burst counts of the deterministic streams.

    The stream explodes to (term, ts) rows first so the DP genuinely
    runs on the per-group shuffled shape (not a metadata shortcut)."""
    base = fixture_range(spark, n_terms * N_EVENTS).selectExpr(
        "id % {n} AS term".format(n=n_terms),
        "CAST(id / {n} AS INT) AS seq".format(n=n_terms),
    )

    def kern(key, pdf):
        k = int(key[0])
        times = term_times(k)[np.sort(pdf["seq"].to_numpy())]
        st = burst_states(times)
        runs = int(((st[1:] == 1) & (st[:-1] == 0)).sum() + (st[:1] == 1).sum())
        idx = np.arange(st.size, dtype=np.int64)
        ck = int(((st * ((idx * _CK_MUL) % _CK_MOD)) % _CK_MOD).sum() % _CK_MOD)
        return pd.DataFrame(
            {"term": [k], "n_bursts": [runs], "n_burst_gaps": [int(st.sum())],
             "ck": [ck]}
        )

    return base.groupBy("term").applyInPandas(
        kern, "term long, n_bursts long, n_burst_gaps long, ck long"
    )


def _burst_oracle() -> str:
    from .mosaic_fp import _values_sql

    rows = []
    for k in range(N_TERMS):
        nb, ng, ck = burst_summary(k)
        rows.append((k, nb, ng, ck))
    return _values_sql(
        [
            ("term", "BIGINT"),
            ("n_bursts", "BIGINT"),
            ("n_burst_gaps", "BIGINT"),
            ("ck", "BIGINT"),
        ],
        rows,
    )


@register("burst_detect_fp", _burst_oracle)
def burst_detect_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg burst intervals of 40 deterministic term streams —
    hash-checked against the sequential direct-kernel replay."""
    return burst_terms(spark)
