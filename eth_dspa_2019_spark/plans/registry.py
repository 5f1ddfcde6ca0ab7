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
# from the FRONT of this mapping. Rather than a static priority list (which
# would permanently demote whatever lands past position 50), the order is
# computed from the committed gate history (`CORRECTNESS_r*.json` at the repo
# root): queries are sorted by the last round in which they had a GREEN gate
# row, least-recent first — so never-green/red queries lead, the stalest
# greens fill the remaining slots, and the freshest greens rotate to the
# back. Every query is re-gated against current code roughly every other
# round with no manual curation.


def _last_green_rounds() -> dict[str, int]:
    """query name -> most recent round with a green driver gate row."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    last: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for q, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("hash_match") is None
                and row.get("err") is None
                and row.get("rows_match") is True
            )
            if green:
                last[q] = max(last.get(q, 0), rnd)
    return last


_LAST_GREEN: dict[str, int] | None = None


def all_queries() -> dict[str, QuerySpec]:
    global _LAST_GREEN
    if _LAST_GREEN is None:
        _LAST_GREEN = _last_green_rounds()
    reg_pos = {n: i for i, n in enumerate(_REGISTRY)}
    ordered = sorted(
        _REGISTRY, key=lambda n: (_LAST_GREEN.get(n, 0), reg_pos[n])
    )
    return {n: _REGISTRY[n] for n in ordered}


def oracle_map() -> dict[str, str]:
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}
