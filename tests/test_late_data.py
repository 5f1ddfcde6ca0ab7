"""W8 end-to-end: the engine's allowedLateness policy under real late data.

Flink's contract (`SN/task/activepost/ActivePostStatistician.java:52-53`):
``outOfOrderness`` bounds the watermark, ``allowedLateness(30m)`` keeps
window state alive past it and RE-FIRES refined results; later-still rows
go to a late-side OutputTag. The engine's Spark policy (SURVEY §7.3,
`streaming/windows.py` module docstring): watermark = outOfOrderness +
allowedLateness, update output mode (every in-allowance refinement is
re-emitted), and the late side output is `late_rows_filter` against the
listener-observed watermark.

Spark semantics detail the test respects (SPARK-40925): a micro-batch
filters late input against the watermark of the PREVIOUS batch
(`watermarkForLateEvents`) and evicts state with the advanced one
(`watermarkForEviction`) — so the beyond-allowance row is sent one batch
AFTER the batch that advanced the watermark past its window.

The test replays four hand-built micro-batches (maxFilesPerTrigger=1,
mtime-ordered), tracks the watermark with a StreamingQueryListener, and
asserts each leg of the contract: refined re-fire, drop, watermark
position, and late-side-output capture.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

from eth_dspa_2019_spark.streaming.windows import late_rows_filter

OUT_OF_ORDER = "10 minutes"
ALLOWED_LATENESS = "30 minutes"
WIDENED = "40 minutes"  # outOfOrderness + allowedLateness

# event times (UTC); watermark after batch 1 = 12:00 − 40m = 11:20
B0 = ["2019-05-01T10:05:00", "2019-05-01T10:59:00"]
B1 = ["2019-05-01T11:45:00", "2019-05-01T12:00:00"]
IN_ALLOWANCE = "2019-05-01T11:35:00"  # behind max event time, ahead of wm
BEYOND = "2019-05-01T10:00:00"  # window end 10:30 ≤ wm 11:20 → dropped
B2 = [IN_ALLOWANCE]
B3 = [BEYOND]

_SCHEMA = T.StructType([T.StructField("ts", T.TimestampType())])


class _WatermarkListener(StreamingQueryListener):
    def __init__(self):
        self.watermarks: list[str] = []
        self.query_id = None

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        if self.query_id in (None, p.get("id")):
            wm = p.get("eventTime", {}).get("watermark")
            if wm:
                self.watermarks.append(wm)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def _write_batches(watch_dir: str) -> None:
    os.makedirs(watch_dir)
    for i, batch in enumerate([B0, B1, B2, B3]):
        path = os.path.join(watch_dir, f"b{i}.json")
        with open(path, "w") as f:
            for ts in batch:
                f.write(json.dumps({"ts": ts}) + "\n")
        # the file source processes oldest-mtime first: pin the order
        t = time.time() - 600 + i * 60
        os.utime(path, (t, t))


def test_allowed_lateness_refire_and_late_side_output(spark, tmp_path):
    watch = str(tmp_path / "watch")
    _write_batches(watch)

    listener = _WatermarkListener()
    spark.streams.addListener(listener)
    try:
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(watch)
        )
        counts = (
            stream.withWatermark("ts", WIDENED)
            .groupBy(F.window("ts", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("w.start").cast("long").alias("ws"),
                F.date_format("w.start", "HH:mm").alias("label"),
                "n",
            )
        )
        q = (
            counts.writeStream.format("memory")
            .queryName("w8_late")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        listener.query_id = str(q.id)
        q.awaitTermination()
        progresses = [json.loads(p.json) for p in q.recentProgress]
        # listener delivery is async — wait for the terminal progress event
        deadline = time.time() + 30
        while len(listener.watermarks) < 3 and time.time() < deadline:
            time.sleep(0.2)
        emitted = [
            (r["label"], r["n"])
            for r in spark.table("w8_late").collect()
        ]
    finally:
        spark.streams.removeListener(listener)

    # 1. in-allowance refinement re-fired: the 11:30 window was emitted
    #    with n=1 (batch 1) and AGAIN with n=2 after the 11:35 straggler —
    #    Flink's allowedLateness re-fire, via update mode
    assert ("11:30", 1) in emitted and ("11:30", 2) in emitted
    # 2. the beyond-allowance 10:00 row was dropped: its window keeps the
    #    batch-0 count, no re-fire, and the state operator counted the drop
    assert ("10:00", 1) in emitted and ("10:00", 2) not in emitted
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in progresses
        for s in p.get("stateOperators", [])
    )
    assert dropped == 1
    # 3. the listener observed the widened watermark reaching 11:20
    #    (12:00 max event time − 40 min) — the eviction frontier
    assert listener.watermarks, "no watermark progress observed"
    final_wm = max(listener.watermarks)
    assert final_wm.startswith("2019-05-01T11:20:00")
    # 4. late side output: filtering the final batch's arrivals against the
    #    observed watermark captures exactly the beyond-allowance row (P8)
    b3 = spark.read.schema(_SCHEMA).json(os.path.join(watch, "b3.json"))
    late = late_rows_filter(b3, final_wm.replace("Z", ""))
    late_ts = [r["ts"].isoformat() for r in late.collect()]
    assert late_ts == ["2019-05-01T10:00:00"]
