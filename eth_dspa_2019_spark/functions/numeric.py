"""Numeric helpers for cross-engine bit-identical aggregates.

Floating-point sums are order-dependent; a distributed partial+final sum and
DuckDB's single-threaded sum can differ in the last ulps. Routing through
``decimal(38,6)`` makes the sum exact (inputs in the testdata carry ≤2
decimal places) and therefore order-independent, then the final cast back to
double is a single deterministic rounding in both engines.

DuckDB oracle mirror:  ``cast(sum(cast(x as decimal(38,6))) as double)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Order-independent double sum (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent double average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def osum(expr: str) -> str:
    """Oracle-side (DuckDB SQL) mirror of :func:`dsum`."""
    return f"cast(sum(cast({expr} as decimal(38,6))) as double)"


def oavg(expr: str) -> str:
    """Oracle-side (DuckDB SQL) mirror of :func:`davg`."""
    return f"cast(sum(cast({expr} as decimal(38,6))) as double) / count({expr})"
