"""Kafka-shaped golden test (S1/S8) — no broker in the container, so the
value-deserialization projection is proven over kafka-SHAPED static frames:
serialize the synthetic activity stream into the connector's wire schema
(key BINARY, value BINARY, topic, partition, offset, timestamp), run
`parse_kafka_frames` over it, and assert the parsed output equals the
direct `load_activities` result — the `Activity.Deserializer` round trip
(`SN/util/Activity.java:96-110`) through the Kafka frame shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.sources.activity import (
    load_activities,
    synth_activity_lines,
)
from eth_dspa_2019_spark.streaming.sources import (
    kafka_sink_options,
    parse_kafka_frames,
)


def _kafka_frames(lines):
    """Wrap pipe-format lines in the exact wire schema the Kafka connector
    yields (`spark-sql-kafka` reader columns). Keyless (round-robin
    producer, S8) → key is NULL; partition round-robins over 4."""
    return lines.select(
        F.lit(None).cast("binary").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        F.lit("all-multiple").alias("topic"),
        (F.monotonically_increasing_id() % 4).cast("int").alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(repr(v) for v in r) for r in df.select(*cols).collect()]
    rows.sort()
    return rows


def test_kafka_frame_round_trip_equals_direct_load(spark, sf_dir):
    frames = _kafka_frames(synth_activity_lines(spark, sf_dir))
    assert dict(frames.dtypes)["value"] == "binary"  # the connector's type
    parsed = parse_kafka_frames(frames)
    direct = load_activities(spark, sf_dir)
    assert sorted(parsed.columns) == sorted(direct.columns)
    assert _canon(parsed) == _canon(direct)


def test_kafka_frame_tombstones_and_errors_route_to_side_outputs(spark):
    """T| control frames and garbage frames must not reach the main output
    when the kafka frame stream is routed through split_side_outputs (O5)."""
    from eth_dspa_2019_spark.sources.activity import split_side_outputs

    lines = spark.createDataFrame(
        [
            ("P|1|7|2019-05-01T12:00:00|"
             "|10.0.0.1|Chrome|en|hello world|[1, 101]|3|4",),
            ("T|0|2019-05-01T13:00:00",),
            ("X|garbage",),
        ],
        "value string",
    )
    frames = _kafka_frames(lines)
    decoded = frames.select(F.col("value").cast("string").alias("value"))
    outs = split_side_outputs(decoded)
    assert outs["main"].count() == 1
    assert outs["tombstones"].collect()[0]["partition_id"] == 0
    assert outs["errors"].count() == 1


def test_kafka_sink_options_shape():
    opts = kafka_sink_options("broker:9092", "recs", "/tmp/ck")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["topic"] == "recs"
    assert opts["checkpointLocation"] == "/tmp/ck"
