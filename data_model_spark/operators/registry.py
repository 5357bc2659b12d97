"""Shared query registry: name -> (Spark callable, DuckDB oracle SQL | None).

Populated by importing the operator modules; consumed by
``__spark_entry__.queries()/oracle_sql()`` and the local parity harness.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    spark_fn: Callable[[SparkSession, str], DataFrame]
    # str -> oracle SQL; callable -> lazy oracle builder (resolved once on
    # first access, for oracles whose literal tables are expensive to
    # derive at import time); None -> rows-only check (non-SQL-expressible)
    _oracle: str | Callable[[], str] | None

    @property
    def oracle(self) -> str | None:
        if callable(self._oracle):
            self._oracle = self._oracle()
        return self._oracle

    @property
    def has_oracle(self) -> bool:
        """Oracle-backed? — without forcing a lazy builder to resolve."""
        return self._oracle is not None


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | Callable[[], str] | None):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (triggering registration) and return all."""
    from . import (  # noqa: F401
        consolidate,
        dedup,
        multimodal,
        pipeline_queries,
        relational,
        reproject,
        similarity,
        spatial_queries,
        text,
        validate,
    )

    return QUERIES
