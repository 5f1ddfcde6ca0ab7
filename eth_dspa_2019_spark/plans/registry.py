"""Registry of (spark query, duckdb oracle) pairs.

Contract (driver `__spark_entry__.py`):
- each spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
- the oracle is ANSI SQL over pre-registered DuckDB views named after the
  testdata tables;
- column names (and value bit-patterns) must match between the two — the
  driver sorts columns by name and hashes values.

Cross-engine determinism rules used throughout the plan modules:
- never return raw timestamps — return epoch seconds as BIGINT;
- sums/avgs of doubles go through ``decimal(38,6)`` so the result is
  order-independent and bit-identical in both engines (helpers in
  :mod:`eth_dspa_2019_spark.functions.numeric`);
- `%` (truncated modulo) matches DuckDB; ``pmod`` does not — use `%`.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a spark query (and optional duckdb oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
