"""Exactly-once streaming file sink: epoch-partitioned dynamic overwrite
must make batch replay idempotent — re-running an epoch replaces its own
partitions and leaves every other epoch untouched."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import types as T

from eth_dspa_2019_spark.streaming.sinks import (
    epoch_partitioned_writer,
    run_exactly_once_sink,
)

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _write(watch, name, rows, mtime):
    path = os.path.join(watch, name)
    with open(path, "w") as f:
        for ts, uid, lang in rows:
            f.write(
                json.dumps({"ts": ts, "user_id": uid, "lang": lang}) + "\n"
            )
    os.utime(path, (mtime, mtime))


def test_stream_writes_epoch_partitions_and_replay_is_idempotent(
    spark, tmp_path
):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    b0 = [("2019-05-01T10:00:00", 1, "en"), ("2019-05-01T10:01:00", 2, "de")]
    b1 = [("2019-05-01T11:00:00", 3, "en")]
    _write(watch, "b0.json", b0, now - 300)
    _write(watch, "b1.json", b1, now - 240)
    out = str(tmp_path / "out")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    run_exactly_once_sink(
        stream, out, str(tmp_path / "ckpt"), partition_cols=["lang"]
    )
    got = spark.read.parquet(out)
    assert got.count() == 3
    epochs = {r.epoch for r in got.select("epoch").distinct().collect()}
    assert epochs == {0, 1}  # one epoch per input file
    # hive layout: epoch=N/lang=L directories
    assert os.path.isdir(os.path.join(out, "epoch=0", "lang=en"))

    # REPLAY epoch 1 (at-least-once redelivery after a crash): same data,
    # same epoch id — the row count must NOT change
    from datetime import datetime

    replay = spark.createDataFrame(
        [(datetime.fromisoformat(ts), uid, lang) for ts, uid, lang in b1],
        _SCHEMA,
    )
    epoch_partitioned_writer(out, ["lang"])(replay, 1)
    assert spark.read.parquet(out).count() == 3

    # a CORRECTED replay of epoch 1 replaces epoch 1 only
    corrected = replay.withColumn("user_id", F.col("user_id") + 100)
    epoch_partitioned_writer(out, ["lang"])(corrected, 1)
    after = spark.read.parquet(out)
    assert after.count() == 3
    assert after.filter(F.col("epoch") == 0).count() == 2  # untouched
    assert {
        r.user_id for r in after.filter(F.col("epoch") == 1).collect()
    } == {103}


def test_compact_epochs_folds_committed_history(spark, tmp_path):
    from eth_dspa_2019_spark.streaming.sinks import compact_epochs

    watch = str(tmp_path / "cwatch")
    os.makedirs(watch)
    now = time.time()
    b0 = [("2019-05-01T10:00:00", 1, "en")]
    b1 = [("2019-05-01T11:00:00", 2, "de")]
    b2 = [("2019-05-01T12:00:00", 3, "en")]
    for i, b in enumerate([b0, b1, b2]):
        _write(watch, f"b{i}.json", b, now - 300 + i * 30)
    out = str(tmp_path / "cout")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    run_exactly_once_sink(
        stream, out, str(tmp_path / "cckpt"), partition_cols=["lang"]
    )
    # fold epochs 0-1, keep the streaming head (epoch 2) replayable
    compact_epochs(spark, out, ["lang"], keep_epochs_from=2)
    live = spark.read.parquet(out)
    assert {r.epoch for r in live.select("epoch").distinct().collect()} == {2}
    folded = spark.read.parquet(out + "_compacted")
    assert folded.count() == 2
    assert "epoch" not in folded.columns
    assert os.path.isdir(os.path.join(out + "_compacted", "lang=en"))
    # union of head + compacted = the full stream, no loss, no duplicates
    assert live.count() + folded.count() == 3
