"""Streaming funnel (keyed state machine) == batch funnel_counts on the
same events — including state carried across micro-batch boundaries."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from eth_dspa_2019_spark.plans.behavior import FUNNEL_STEPS, funnel_counts
from eth_dspa_2019_spark.streaming import run_to_memory
from eth_dspa_2019_spark.streaming.funnel import funnel_stream

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

_ROWS = [
    # user 1 completes the full funnel, split ACROSS batches
    (1, "signup", 1000),
    (1, "view", 2000),
    # user 2: view before signup must not count toward stage 2
    (2, "view", 1500),
    (2, "signup", 1600),
    # --- batch boundary ---
    (1, "click", 3000),
    (1, "purchase", 4000),
    (2, "view", 2500),
    # user 2 stalls at view; duplicate signup must not re-fire stage 1
    (2, "signup", 2600),
    # user 3 appears only in batch 2
    (3, "signup", 3500),
]
_SPLIT = 4


def _write(watch, name, rows, mtime):
    with open(os.path.join(watch, name), "w") as f:
        for u, t, ts in rows:
            f.write(json.dumps({"user_id": u, "event_type": t, "ts_ms": ts}) + "\n")
    os.utime(os.path.join(watch, name), (mtime, mtime))


def test_streaming_funnel_matches_batch(spark, tmp_path):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    _write(watch, "b0.json", _ROWS[:_SPLIT], now - 300)
    _write(watch, "b1.json", _ROWS[_SPLIT:], now - 200)

    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        funnel_stream(stream), str(tmp_path / "ckpt"), output_mode="append"
    )
    completions = sorted(tuple(r) for r in got.collect())
    # exact per-user stage completions from a reference scan
    assert completions == sorted(
        [
            (1, 1, "signup", 1000),
            (1, 2, "view", 2000),
            (1, 3, "click", 3000),
            (1, 4, "purchase", 4000),
            (2, 1, "signup", 1600),
            (2, 2, "view", 2500),
            (3, 1, "signup", 3500),
        ]
    )
    # aggregate form == the batch funnel on the same rows
    batch = spark.createDataFrame(
        [(u, t, ts) for u, t, ts in _ROWS], "user_id long, event_type string, ts long"
    )
    batch_counts = {
        r["step_name"]: r["users"] for r in funnel_counts(batch).collect()
    }
    stream_counts = {
        s: sum(1 for c in completions if c[2] == s) for s in FUNNEL_STEPS
    }
    assert stream_counts == batch_counts


def test_streaming_funnel_counts_late_drops(spark, tmp_path):
    """A replay that violates the ordered-arrival precondition (an event
    arriving strictly before a user's already-advanced stage clock) must
    be observable: the optional accumulator counts the dropped-from-view
    events instead of the stream silently undercounting (ADVICE r5)."""
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    _write(watch, "b0.json", [(1, "signup", 1000), (1, "view", 2000)], now - 300)
    # arrives a batch late: strictly before the stage clock (2000)
    _write(watch, "b1.json", [(1, "click", 1500)], now - 200)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    late = spark.sparkContext.accumulator(0)
    got = run_to_memory(
        funnel_stream(stream, late_counter=late),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    # the late click is not a qualifying stage-3 completion (clock moved on)
    assert sorted(r["step"] for r in got.collect()) == [1, 2]
    assert late.value == 1


def test_streaming_funnel_survives_arrow_chunking(spark, tmp_path):
    """A per-user group larger than the Arrow batch size arrives as
    multiple chunks; reverse-ordered input must still complete every
    stage (regression: sorting chunks independently lost stages)."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        watch = str(tmp_path / "watch")
        os.makedirs(watch)
        rows = [
            (1, "purchase", 4000),
            (1, "click", 3000),
            (1, "view", 2000),
            (1, "signup", 1000),
        ]
        _write(watch, "b0.json", rows, time.time() - 300)
        stream = spark.readStream.schema(_SCHEMA).json(watch)
        got = run_to_memory(
            funnel_stream(stream),
            str(tmp_path / "ckpt2"),
            output_mode="append",
        )
        assert sorted(r["step"] for r in got.collect()) == [1, 2, 3, 4]
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )
