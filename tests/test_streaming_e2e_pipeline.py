"""Flagship streaming composition: file source → watermarked tumbling
aggregation → idempotent epoch-partitioned sink, run to completion, then
RESUMED from the checkpoint with late-arriving input — the output
directory must equal the batch aggregation over everything, with no
duplicates despite the second run."""

from __future__ import annotations

import json
import os
import time

import pyspark.sql.functions as F
from pyspark.sql import types as T

from eth_dspa_2019_spark.streaming.sinks import run_exactly_once_sink
from eth_dspa_2019_spark.streaming.windows import tumbling_counts_stream

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _write(watch, name, rows, mtime):
    path = os.path.join(watch, name)
    with open(path, "w") as f:
        for ts, et in rows:
            f.write(json.dumps({"ts": ts, "event_type": et}) + "\n")
    os.utime(path, (mtime, mtime))


def test_pipeline_resumes_from_checkpoint_without_duplicates(
    spark, tmp_path
):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    first = [
        ("2019-05-01T10:05:00", "click"),
        ("2019-05-01T10:10:00", "view"),
        ("2019-05-01T10:40:00", "click"),
        # watermark driver: closes the 10:00 and 10:30 windows
        ("2019-05-01T12:00:00", "view"),
    ]
    _write(watch, "b0.json", first, now - 300)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(watch)
        )
        counts = tumbling_counts_stream(stream)  # append mode after close
        run_exactly_once_sink(counts, out, ckpt, partition_cols=[])

    run()
    got1 = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    # the 12:00 window is not closed yet; the first three events' windows are
    assert got1[(1556704800, "click")] == 1  # 10:00 window
    assert got1[(1556704800, "view")] == 1
    assert got1[(1556706600, "click")] == 1  # 10:30 window

    # NEW data arrives; resume from the same checkpoint. The already-closed
    # windows must not be re-emitted (no duplicates in the directory), and
    # the 12:00 window closes once the new watermark passes it.
    _write(
        watch,
        "b1.json",
        [("2019-05-01T12:20:00", "click"), ("2019-05-01T14:00:00", "view")],
        now - 240,
    )
    run()
    rows = spark.read.parquet(out).collect()
    got2 = {}
    for r in rows:
        key = (r.window_start, r.event_type)
        assert key not in got2, f"duplicate output for {key}"
        got2[key] = r.n_events
    assert got2[(1556712000, "view")] == 1  # 12:00 window now closed
    assert got2[(1556712000, "click")] == 1  # 12:00-12:30 contains 12:20
    # still exactly one row per previously-closed window
    assert got2[(1556704800, "click")] == 1
    assert got2[(1556706600, "click")] == 1
