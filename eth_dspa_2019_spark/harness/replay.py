"""Replay/disorder harness: the reference producer's seeded random lateness
(`SN/Producer.java:33-37`: subtract ``random.nextInt(bound)`` ms from each
event's emission order while keeping the original event time) is the test
dimension that stresses watermark correctness (SURVEY §5.6).

Speed-up pacing (`speedupFactor`): :func:`paced_replay` emits event-time
chunks to a file-stream directory on the reference producer's schedule —
chunk wall-clock offset = (chunk event-time start − stream start) /
speedup_factor (`SN/Producer.java:33-37`, `Config.speedupFactor`,
`README.md:14`: ×604800 streams a week of event time per second).
Unthrottled fast-test mode = Trigger.AvailableNow over the already-written
files, matching the reference's "as quickly as possible" mode.
"""

from __future__ import annotations

import time
from collections.abc import Callable

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


def paced_replay(
    lines: DataFrame,
    out_dir: str,
    speedup_factor: float,
    chunk_event_seconds: int = 3600,
    ts_col: str = "ts",
    value_col: str = "value",
    sleep: Callable[[float], None] = time.sleep,
    clock: Callable[[], float] = time.monotonic,
) -> list[tuple[str, float]]:
    """Replay a bounded line set as a paced file stream: bucket lines into
    ``chunk_event_seconds`` event-time chunks, write chunk *i* as
    ``chunk{i:06d}`` inside ``out_dir`` at wall-clock offset
    ``(chunk_start − t0) / speedup_factor`` from the replay start — a file
    readStream on ``out_dir`` then observes the reference producer's paced
    emission. Returns ``[(path, scheduled_offset_seconds), ...]``.

    ``sleep``/``clock`` are injectable so tests assert the schedule
    deterministically (and a driver can pass no-ops for unthrottled mode).
    The per-chunk driver loop is harness replay control, not an engine
    operator — the engine only ever sees the file stream.
    """
    bounded = lines.select(
        F.col(value_col).alias("value"), F.col(ts_col).alias("ts")
    ).withColumn("epoch", F.unix_timestamp("ts"))
    # snapshot: the replay loop takes one action per chunk, and the input
    # plan may be nondeterministic across actions (limit, sample, shuffle)
    bounded = bounded.localCheckpoint(eager=True)
    t0 = bounded.agg(F.min("epoch")).collect()[0][0]
    chunked = bounded.withColumn(
        "chunk", ((F.col("epoch") - F.lit(t0)) / chunk_event_seconds).cast("int")
    )
    chunk_ids = sorted(
        r["chunk"] for r in chunked.select("chunk").distinct().collect()
    )
    start = clock()
    out: list[tuple[str, float]] = []
    for i in chunk_ids:
        scheduled = i * chunk_event_seconds / speedup_factor
        delay = scheduled - (clock() - start)
        if delay > 0:
            sleep(delay)
        path = f"{out_dir}/chunk{i:06d}"
        chunked.filter(F.col("chunk") == i).select("value").coalesce(1).write.mode(
            "overwrite"
        ).text(path)
        out.append((path, scheduled))
    return out
