"""Query registry: the single source of truth for the engine surface.

Every operator from SURVEY.md §2 registers here as a named query
``(spark, sf_dir) -> DataFrame`` plus, where ANSI-SQL-expressible, a
DuckDB oracle SQL string. ``__spark_entry__.py`` simply re-exports
:func:`all_queries` / :func:`all_oracles` to the driver harness.

Contract details (driver protocol, __spark_entry__.py docstring):
- output column names must match between Spark and oracle (the compare
  sorts columns by name before hashing) — every computed column is
  ``.alias``-ed identically on both sides;
- outputs are made deterministic (sorted arrays, tie-broken top-k) and
  cross-engine-stable (rounded doubles, DATE/epoch instead of raw
  timestamps — SURVEY.md §7 risk register).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(key: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query (and optional DuckDB oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        assert key not in _QUERIES, f"duplicate query key {key}"
        _QUERIES[key] = fn
        if oracle is not None:
            _ORACLES[key] = oracle
        return fn

    return deco


def _ensure_loaded() -> None:
    import engine

    engine.load_all()


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


def get(key: str) -> tuple[QueryFn, str | None]:
    _ensure_loaded()
    return _QUERIES[key], _ORACLES.get(key)
