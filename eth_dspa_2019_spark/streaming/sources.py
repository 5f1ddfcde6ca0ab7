"""Streaming sources: file replay of the testdata (S3/S4-as-stream) and the
Kafka reader/writer option builders (S1/S8).

Kafka itself is not available in the test container (no broker, no
spark-sql-kafka package), so the Kafka functions build the reader/writer
configuration and parse projection — the parts that are engine logic — and
raise a clear error only at `.load()` time if the connector is absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# events.parquet stores TIMESTAMP(NANOS); with nanosAsLong the file schema is
# int64 nanos (see session.py) — declared as such and converted after read.
_EVENTS_FILE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file-replay stream of the events table (one file → one
    micro-batch under Trigger.AvailableNow — the reference's unthrottled
    replay mode, `SN/Producer.java:66-73`).

    The file stream source watches a *directory*; the testdata dir mixes
    all tables, so a temp watch dir holding a symlink to events.parquet is
    staged per call (in production the stream would watch a landing dir).
    """
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    watch = tempfile.mkdtemp(prefix="stream_events_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(watch, "events.parquet"),
    )
    raw = (
        spark.readStream.schema(_EVENTS_FILE_SCHEMA)
        .format("parquet")
        .load(watch)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def parse_kafka_frames(frames: DataFrame) -> DataFrame:
    """The Kafka value-deserialization projection, factored out so it can
    be golden-tested against kafka-SHAPED static frames without a broker:
    takes any DataFrame with the connector's wire columns
    (``key BINARY, value BINARY`` — plus topic/partition/offset/timestamp,
    all ignored), UTF-8-decodes the value, and tag-dispatch-parses it —
    `Activity.Deserializer.deserialize(byte[])`
    (`SN/util/Activity.java:96-110`). Works identically on a static frame
    and on the live `readStream.format("kafka")` output because the parse
    is a pure projection.
    """
    from ..sources.activity import parse_activities

    return parse_activities(
        frames.select(F.col("value").cast("string").alias("value"))
    )


def kafka_activity_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str = "all-multiple",
    starting_offsets: str = "earliest",
):
    """Kafka activity source (S1): subscribe from the earliest offset and
    hand the value strings to the pipe-format parser — the Spark shape of
    `FlinkKafkaConsumer011<Activity>` + `Activity.Deserializer`
    (`SN/SocialNetwork.java:68-87`, `SN/util/Activity.java:96-110`).

    Returns the parsed activity DataFrame. End-of-stream tombstones (O5)
    are data, not connector state: bounded runs use Trigger.AvailableNow;
    unbounded runs filter ``kind = 'tombstone'`` and stop the query from a
    monitor when one arrives per partition.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    return parse_kafka_frames(reader.load())


def kafka_sink_options(
    bootstrap_servers: str, topic: str, checkpoint_dir: str
) -> dict[str, str]:
    """Kafka sink options (S8). Round-robin partitioning = send without a
    key (Kafka's default sticky/round-robin partitioner — the Spark
    equivalent of the reference's custom `FlinkKafkaPartitioner`,
    `session-4-kafka/.../FlinkKafkaProducer.java:123-133`)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "topic": topic,
        "checkpointLocation": checkpoint_dir,
    }
