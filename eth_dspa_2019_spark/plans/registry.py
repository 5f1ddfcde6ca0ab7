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


# The external correctness gate checks at most 50 queries per round, taken
# from the FRONT of this mapping. Queries that have never had a gate row
# (they registered after the registry crossed 50 entries) are promoted to
# the front so every query gets at least one hard driver-side check; the
# rest keep registration order (all of them have green rows from earlier
# rounds).
_DRIVER_PRIORITY = (
    "benchmark_contamination dedup_keep_best doc_pack_chunks doc_repetition "
    "embedding_centroid_dist pii_redaction quality_quantile_filter "
    "stratified_sample_docs error_windows_merged events_asof_last_purchase "
    "event_rollup global_time_order_sample purchases_in_error_windows "
    "salted_event_counts unique_users_approx value_percentiles_exact "
    "word_counts tumbling_counts_10s simhash_pairs_wide ann_topk_multiprobe"
).split()


def all_queries() -> dict[str, QuerySpec]:
    front = [n for n in _DRIVER_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(front)]
    return {n: _REGISTRY[n] for n in front + rest}


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
