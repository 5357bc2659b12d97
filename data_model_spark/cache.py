"""Session-lifetime cache registry for lazily-consumed intermediates.

Operators like the dedup self-join and the PIP cover explosion persist
their most expensive intermediate because the returned (lazy) DataFrame
reads it several times — which means the operator itself can never
unpersist (the cache backs the result plan).  Every such persist routes
through ``track`` so long-lived sessions (bench loops, notebooks,
services) can release them all between iterations with
``unpersist_tracked()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register it for later bulk release."""
    df = df.persist()
    _PERSISTED.append(df)
    return df


def unpersist_tracked() -> int:
    """Release every tracked cache; returns how many were released."""
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
        n += 1
    return n
