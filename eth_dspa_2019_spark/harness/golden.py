"""Golden-diff comparison as an engine API (T4/U4): the reference validates
with ``diff <(sort actual) <(sort expected)`` and set-membership checks
(`scripts/check_stats.sh:1-4`, `scripts/compare_users.py:1-24`); here that
is ``exceptAll`` both ways — order-insensitive, multiplicity-aware."""

from __future__ import annotations

from pyspark.sql import DataFrame


def golden_diff(actual: DataFrame, expected: DataFrame) -> dict[str, int]:
    """Rows only in ``actual`` / only in ``expected`` (multiset semantics).
    Empty both ways ⟺ the outputs match the sorted-diff criterion."""
    extra = actual.exceptAll(expected).count()
    missing = expected.exceptAll(actual).count()
    return {"extra": extra, "missing": missing}


def assert_golden(actual: DataFrame, expected: DataFrame) -> None:
    d = golden_diff(actual, expected)
    assert d == {"extra": 0, "missing": 0}, f"golden diff: {d}"
