"""Streaming Task 3 anomaly flagging == the batch oracle-checked query,
regardless of micro-batch boundaries (event-time-ordered chunks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.sources.activity import load_activities
from eth_dspa_2019_spark.streaming.anomaly import StreamingAnomalyDetector


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_anomalies_equal_batch(spark, sf_dir):
    acts = load_activities(spark, sf_dir)
    batch = all_queries()["task3_anomalies"].spark(spark, sf_dir)

    det = StreamingAnomalyDetector(spark)
    # three uneven event-TIME-ordered chunks (ids don't follow event time
    # for likes, whose id is the liked post's id — chunk on ts_ms)
    lo_ts, hi_ts = acts.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    c1 = lo_ts + (hi_ts - lo_ts) // 7
    c2 = lo_ts + (hi_ts - lo_ts) // 2
    for lo, hi in [(lo_ts, c1), (c1, c2), (c2, hi_ts + 1)]:
        det.process_batch(
            acts.filter((F.col("ts_ms") >= lo) & (F.col("ts_ms") < hi))
        )
    assert _rows(det.anomalies()) == _rows(batch)


def test_streaming_anomalies_single_batch(spark, sf_dir):
    acts = load_activities(spark, sf_dir)
    batch = all_queries()["task3_anomalies"].spark(spark, sf_dir)
    det = StreamingAnomalyDetector(spark)
    det.process_batch(acts)
    assert _rows(det.anomalies()) == _rows(batch)
