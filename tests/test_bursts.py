"""Kleinberg bursts: planted-burst recovery + automaton properties."""

import numpy as np

from data_model_spark.operators.bursts import (
    BURST_HI,
    BURST_LO,
    burst_states,
    term_times,
)


def test_planted_burst_recovered():
    for k in range(8):
        st = burst_states(term_times(k))
        on = np.flatnonzero(st == 1)
        assert on.size == BURST_HI - BURST_LO
        assert on.min() == BURST_LO and on.max() == BURST_HI - 1


def test_uniform_stream_no_burst():
    times = np.arange(50, dtype=np.float64) * 7.0
    assert (burst_states(times) == 0).all()


def test_higher_gamma_suppresses_bursts():
    t = term_times(0)
    lo = burst_states(t, gamma=1.0).sum()
    hi = burst_states(t, gamma=100.0).sum()
    assert hi <= lo
    assert hi == 0


def test_empty_and_single_event():
    assert burst_states(np.array([5.0])).size == 0
    assert burst_states(np.zeros(0)).size == 0
