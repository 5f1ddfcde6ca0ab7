"""Event-time helpers.

The testdata parquet stores naive timestamps (TIMESTAMP_NTZ in Spark 4).
With the session timezone pinned to UTC (session.py), NTZ → TIMESTAMP → LONG
yields the same epoch seconds as DuckDB's ``floor(epoch(ts))`` — the reference
parses all timestamps in GMT+0 too (`SN/util/Activity.java:44-50`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Epoch seconds (BIGINT, truncated) from any timestamp flavour."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("long")
