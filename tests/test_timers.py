"""Event-time timers (transformWithStateInPandas): the session closer's
output — inline gap closes + timer-closed trailing sessions — must equal
the batch ``session_window`` semantics for every user whose trailing
deadline the watermark passed."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from eth_dspa_2019_spark.streaming.timers import session_close_stream
from eth_dspa_2019_spark.streaming.windows import run_to_memory

_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ]
)


def _write(watch, name, rows, mtime):
    path = os.path.join(watch, name)
    with open(path, "w") as f:
        for ts, uid in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")
    os.utime(path, (mtime, mtime))


def test_timer_closed_sessions_equal_batch_session_windows(spark, tmp_path):
    watch = str(tmp_path / "watch")
    os.makedirs(watch)
    now = time.time()
    # user 1: session A (10:00-10:10), then session B (11:30-11:35);
    # user 2: single-event session at 10:05. The gap between A and B closes
    # A INLINE (observed by B's first event); B and user 2's sessions can
    # only close via the EVENT-TIME TIMER once the sentinel user 999
    # advances the watermark past their trailing deadlines.
    b0 = [
        ("2019-05-01T10:00:00", 1),
        ("2019-05-01T10:10:00", 1),
        ("2019-05-01T10:05:00", 2),
    ]
    b1 = [("2019-05-01T11:30:00", 1), ("2019-05-01T11:35:00", 1)]
    b2 = [("2019-05-01T14:00:00", 999)]
    _write(watch, "b0.json", b0, now - 300)
    _write(watch, "b1.json", b1, now - 240)
    _write(watch, "b2.json", b2, now - 180)
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(watch)
    )
    got = run_to_memory(
        session_close_stream(stream, gap="30 minutes", watermark="30 minutes"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }

    # batch spec: session_window over the same events, users 1 and 2 only
    # (999's trailing deadline is past the final watermark, so it stays open)
    from datetime import datetime

    batch = spark.createDataFrame(
        [(datetime.fromisoformat(ts), uid) for ts, uid in b0 + b1],
        _SCHEMA,
    )
    want_rows = {
        (r.user_id, r.start, r.end, r.n)
        for r in (
            batch.groupBy(
                F.session_window("ts", "30 minutes").alias("sw"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                "user_id",
                F.col("sw.start").cast("long").alias("start"),
                F.col("sw.end").cast("long").alias("end"),
                "n",
            )
            .collect()
        )
    }
    assert got_rows == want_rows
    assert len(got_rows) == 3  # A inline, B + user2 by timer
