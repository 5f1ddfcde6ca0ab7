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

def _events_file_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """Probe the parquet footer for the ts layout the driver shipped this
    round: TIMESTAMP(NANOS) (surfaced as int64 with nanosAsLong) in early
    rounds, plain micros TIMESTAMP_NTZ since. The file stream source needs
    an explicit schema, so declare whichever layout the file actually has
    (mirrors the dual-layout normalization in ``io/readers.load_table``)."""
    return spark.read.parquet(f"{sf_dir}/events.parquet").schema


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded file-replay stream of the events table (one file → one
    micro-batch under Trigger.AvailableNow — the reference's unthrottled
    replay mode, `SN/Producer.java:66-73`).

    The file stream source watches a *directory*; the testdata dir mixes
    all tables, so a temp watch dir holding a symlink to events.parquet is
    staged per call (in production the stream would watch a landing dir).
    Whatever the physical ts layout (int64 nanos or TIMESTAMP_NTZ micros),
    the returned frame always carries session-UTC ``ts TIMESTAMP``.
    """
    import os
    import tempfile

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    file_schema = _events_file_schema(spark, sf_dir)
    watch = tempfile.mkdtemp(prefix="stream_events_")
    os.symlink(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(watch, "events.parquet"),
    )
    raw = spark.readStream.schema(file_schema).format("parquet").load(watch)
    ts_type = file_schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Explicit TimestampType(): conf-independent even if the harness session
    # sets spark.sql.timestampType=TIMESTAMP_NTZ (ADVICE r3).
    return raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))


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
