"""Streaming exact dedup (`dedup_stream`): bounded-state first-row-per-key
over a replayed stream with duplicates — streaming output must equal the
batch distinct-on-key result (the dual-implementation golden methodology).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from eth_dspa_2019_spark.streaming import dedup_stream, run_to_memory

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("payload", T.StringType()),
    ]
)


def _write(watch: str, name: str, rows: list[tuple[str, int, str]], mtime: float):
    path = os.path.join(watch, name)
    with open(path, "w") as f:
        for ts, eid, payload in rows:
            f.write(
                json.dumps({"ts": ts, "event_id": eid, "payload": payload})
                + "\n"
            )
    os.utime(path, (mtime, mtime))


def test_dedup_stream_removes_in_watermark_duplicates(spark, tmp_path):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    # batch 0: three events, one internal duplicate (same event_id)
    _write(
        watch,
        "b0.json",
        [
            ("2019-05-01T10:00:00", 1, "a"),
            ("2019-05-01T10:01:00", 2, "b"),
            ("2019-05-01T10:02:00", 1, "a-dup"),
        ],
        now - 300,
    )
    # batch 1: cross-batch duplicate (id 2) within the watermark + fresh id
    _write(
        watch,
        "b1.json",
        [
            ("2019-05-01T10:10:00", 2, "b-dup"),
            ("2019-05-01T10:11:00", 3, "c"),
        ],
        now - 240,
    )
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        dedup_stream(stream, ["event_id"], watermark="30 minutes"),
        str(tmp_path / "ck"),
        "append",
    )
    rows = {(r["event_id"], r["payload"]) for r in got.collect()}
    # first occurrence wins, duplicates (in-batch AND cross-batch) dropped
    assert rows == {(1, "a"), (2, "b"), (3, "c")}


def test_dedup_stream_state_is_bounded_by_watermark(spark, tmp_path):
    """The state contract: a duplicate arriving AFTER the watermark passed
    its key's event time is treated as a new row (state was dropped) —
    bounded state is exactly what makes streaming dedup viable at scale."""
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    _write(watch, "b0.json", [("2019-05-01T10:00:00", 1, "first")], now - 300)
    # advances watermark to 11:30 (12:00 − 30m), past id 1's 10:30 expiry
    _write(watch, "b1.json", [("2019-05-01T12:00:00", 2, "mid")], now - 240)
    # eviction is lazy (runs at the END of the batch the watermark passes
    # the key's expiry in) — this batch triggers it for id 1
    _write(watch, "b2.json", [("2019-05-01T12:01:00", 3, "bump")], now - 180)
    # duplicate of id 1 arriving after its state was dropped → new row
    _write(watch, "b3.json", [("2019-05-01T11:45:00", 1, "again")], now - 120)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        dedup_stream(stream, ["event_id"], watermark="30 minutes"),
        str(tmp_path / "ck"),
        "append",
    )
    payloads = sorted(r["payload"] for r in got.collect())
    assert payloads == ["again", "bump", "first", "mid"]
