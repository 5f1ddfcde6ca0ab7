"""Streaming window/state operators mirroring the batch plans.

Late-data policy (W8): Flink separates out-of-orderness (watermark) from
``allowedLateness`` (state retention + re-firing); Spark has one knob. The
engine's policy: watermark = outOfOrderness + allowedLateness with
``update`` output — every on-time and in-allowance refinement is emitted;
records later than that are dropped by the state store, and a "late side
output" (P8) is a parallel filter ``event_time < observed watermark`` fed
from StreamingQueryProgress (see late_rows_filter). The full contract —
re-fire on in-allowance stragglers, drop + side-output capture beyond the
allowance, listener-observed watermark — is end-to-end-tested in
`tests/test_late_data.py`.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts_stream(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming W1/A1: 30-min tumbling counts per event_type with a
    30-min bounded-out-of-orderness watermark
    (`SN/SocialNetwork.java:78-83`, `.../WikipediaAnalysisWindowed.java`).
    Same expressions as the batch `tumbling_counts_30m` oracle query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sliding_counts_two_stage_stream(
    events: DataFrame, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming W2/A2 with the reference's two-stage decomposition
    (`ActivePostStatistician.java:56-78`): 30-min tumbling partials feeding
    a 12h/30m sliding sum — CHAINED stateful window aggregations
    (window_time re-timestamps the partials), supported since Spark 3.4.
    The sliding state holds partials, not raw events: 24× less state."""
    partial = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "30 minutes").alias("w30"), "event_type")
        .agg(F.count(F.lit(1)).alias("pn"))
    )
    return (
        partial.groupBy(
            F.window(
                F.window_time("w30"), "12 hours", "30 minutes"
            ).alias("w"),
            "event_type",
        )
        .agg(F.sum("pn").alias("n_events"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def unique_users_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming W3/A4: sliding 12h/1h distinct users."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "12 hours", "1 hour").alias("w"))
        .agg(F.approx_count_distinct("user_id").alias("n_users_approx"))
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_users_approx",
        )
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming A8/O7: per-user running value totals — unwindowed keyed
    aggregation, emitted per update (the session-1 running reduce,
    `session-1-flink/.../WikipediaAnalysis.java:79-86`)."""
    return events.groupBy("user_id").agg(
        F.sum("value").alias("running_value"), F.count(F.lit(1)).alias("n")
    )


_STATE_SCHEMA = "total double, n bigint"
_OUT_SCHEMA = "user_id bigint, running_value double, n bigint"


def _running_sum_fn(key, pdf_iter, state: GroupState):
    """applyInPandasWithState update fn: Flink `ValueState` running sum
    (O1/O7 — `session-9/.../FlinkKafkaConsumer.java:107-137`)."""
    if state.exists:
        total, n = state.get
    else:
        total, n = 0.0, 0
    for pdf in pdf_iter:
        total += float(pdf["value"].sum())
        n += int(len(pdf))
    state.update((total, n))
    yield pd.DataFrame(
        {"user_id": [key[0]], "running_value": [total], "n": [n]}
    )


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """O1/O2/O7: per-key mutable state via ``applyInPandasWithState`` — the
    `KeyedProcessFunction`/`ValueState` analog (Arrow-batched, grouped by
    key; state lives in the state store, checkpointable)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_sum_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(
    df: DataFrame,
    checkpoint_dir: str,
    output_mode: str = "complete",
    name: str | None = None,
    collect_progress: list | None = None,
) -> DataFrame:
    """Execute a bounded streaming query with Trigger.AvailableNow into a
    memory sink (S7-style) with checkpointing (O6) and return the result
    as a DataFrame. The reference's replay-to-completion test mode.

    Pass a list as ``collect_progress`` to receive the per-batch
    StreamingQueryProgress dicts — watermark position, state-store rows,
    input rates: the O8 progress/frontier surface (Timely's
    probe/frontier, `session-2-timely/.../main.rs:24-40`)."""
    name = name or f"q_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if collect_progress is not None:
        import json

        collect_progress.extend(json.loads(p.json) for p in q.recentProgress)
    return df.sparkSession.table(name)


#: O6: the RocksDB state store provider (incremental, spill-to-disk state —
#: the reference's RocksDB backend + incremental checkpoints,
#: `session-9/wiki-edits/.../FlinkKafkaConsumer.java:66-73`). Set per
#: session: get_spark(extra_conf=ROCKSDB_STATE_CONF).
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


def dedup_stream(
    df: DataFrame, keys: list[str], watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: keep the first row per
    key, holding each key's dedup state only until the event-time
    watermark passes it (``dropDuplicatesWithinWatermark``). The streaming
    counterpart of `operators/dedup.py::exact_dedup`: at 100 TB/day the
    unbounded `dropDuplicates` state would grow forever — bounding
    retention by the out-of-orderness window is the standard contract
    (duplicates straggling beyond the watermark are late data, W8 policy).
    The event-time column must already be present; caller picks the keys
    (e.g. activity id, or a content hash for payload dedup).
    """
    return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def late_rows_filter(df: DataFrame, watermark_ts: str) -> DataFrame:
    """P8/W8 late side output: rows behind an observed watermark (taken
    from StreamingQueryProgress.eventTime['watermark'] by the caller) —
    the records Flink would route to the late OutputTag."""
    return df.filter(F.col("ts") < F.lit(watermark_ts).cast("timestamp"))
