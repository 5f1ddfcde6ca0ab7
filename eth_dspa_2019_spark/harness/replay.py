"""Replay/disorder harness: the reference producer's seeded random lateness
(`SN/Producer.java:33-37`: subtract ``random.nextInt(bound)`` ms from each
event's emission order while keeping the original event time) is the test
dimension that stresses watermark correctness (SURVEY §5.6).

Speed-up pacing (`speedupFactor`) is wall-clock emission control and lives
in the driver harness, not the engine; with Trigger.AvailableNow the replay
is unthrottled, matching the reference's fast-test mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_random_lateness(
    events: DataFrame,
    bound_seconds: int = 1800,
    seed: int = 42,
    ts_col: str = "ts",
) -> DataFrame:
    """Add an ``arrival_ts`` column = event time + seeded uniform lateness
    in [0, bound): processing order by arrival, event-time semantics by the
    original column (F10). Disorder is bounded, so a watermark of
    ``bound_seconds`` makes windowed results equal to the in-order run."""
    late = (F.rand(seed) * bound_seconds).cast("long")
    return events.withColumn(
        "arrival_ts", F.col(ts_col) + F.make_interval(secs=late)
    )
