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


# ---------------------------------------------------------------------------
# Byte-level wire protocol (VERDICT r9 #7): v2 RecordBatch framing round-trip
# through segment files — the produce→consume path with no broker.

from eth_dspa_2019_spark.streaming.kafka_wire import (  # noqa: E402
    crc32c,
    encode_record_batch,
    iter_records,
    read_log_segments,
    write_log_segments,
)


def test_crc32c_known_answer():
    # the public CRC-32C check value — proves Castagnoli, not zlib CRC-32
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_record_batch_bytes_round_trip():
    recs = [
        (None, b"P|1|7|2019-05-01T12:00:00|x", 1000),
        (b"k1", b"C|2|8|2019-05-01T12:00:01|1|", 1005),
        (None, None, 1010),  # kafka-native tombstone: null value
    ]
    seg = encode_record_batch(5, recs) + encode_record_batch(
        8, [(None, b"L|9|1|2019-05-01T12:01:00", 2000)]
    )
    got = list(iter_records(seg))
    assert got == [
        (5, 1000, None, recs[0][1]),
        (6, 1005, b"k1", recs[1][1]),
        (7, 1010, None, None),
        (8, 2000, None, b"L|9|1|2019-05-01T12:01:00"),
    ]


def test_record_batch_crc_detects_corruption():
    import pytest

    seg = bytearray(encode_record_batch(0, [(None, b"P|1|x", 0)]))
    seg[40] ^= 0x01  # flip one payload byte
    with pytest.raises(ValueError, match="CRC"):
        list(iter_records(bytes(seg)))
    with pytest.raises(ValueError, match="truncated"):
        list(iter_records(bytes(seg[:-2])))


def test_segment_produce_consume_equals_direct_load(spark, sf_dir, tmp_path):
    """Full S8→S1 byte path: pipe-format toString() values → v2 record
    batches in per-partition segment files → binaryFile scan + batch
    decode → connector wire schema → parse → equals the direct load;
    tombstone EOS markers route to the control side output."""
    from eth_dspa_2019_spark.sources.activity import split_side_outputs

    seg_dir = str(tmp_path / "kafka-log")
    stats = write_log_segments(
        synth_activity_lines(spark, sf_dir), seg_dir, n_partitions=4,
        batch_records=97,  # deliberately not a divisor: multi-batch tails
    ).collect()
    assert sorted(r["partition"] for r in stats) == [0, 1, 2, 3]
    assert all(r["n_batches"] >= 1 for r in stats)

    frames = read_log_segments(spark, seg_dir)
    assert dict(frames.dtypes)["value"] == "binary"
    n_lines = synth_activity_lines(spark, sf_dir).count()
    assert frames.count() == n_lines + 4  # + one tombstone per partition

    # offsets are dense per partition (consumer ordering contract)
    per_part = {
        r["partition"]: (r["n"], r["lo"], r["hi"])
        for r in frames.groupBy("partition")
        .agg(F.count("*").alias("n"), F.min("offset").alias("lo"),
             F.max("offset").alias("hi"))
        .collect()
    }
    for _p, (n, lo, hi) in per_part.items():
        assert (lo, hi) == (0, n - 1)

    outs = split_side_outputs(
        frames.select(F.col("value").cast("string").alias("value"))
    )
    assert outs["errors"].count() == 0
    assert sorted(
        r["partition_id"] for r in outs["tombstones"].collect()
    ) == [0, 1, 2, 3]
    assert _canon(outs["main"]) == _canon(load_activities(spark, sf_dir))


def test_gzip_batch_round_trip_and_crc():
    """Codec attribute bits (VERDICT r10 #8): a gzip-compressed v2 batch
    (attributes codec id 1, records array gzipped, CRC over the
    COMPRESSED bytes) round-trips record-for-record with the plain
    encoding; a flipped compressed byte is caught by the CRC, a
    truncated gzip stream by inflate; snappy/lz4/zstd ids are rejected
    by name, never silently mis-decoded."""
    import struct

    import pytest

    recs = [
        (None, b"P|1|7|2019-05-01T12:00:00|x" * 20, 1000),
        (b"k1", b"C|2|8|2019-05-01T12:00:01|1|" * 20, 1005),
        (None, None, 1010),
    ]
    plain = encode_record_batch(5, recs)
    gz = encode_record_batch(5, recs, codec="gzip")
    assert gz != plain
    assert len(gz) < len(plain)  # repetitive payload actually compresses
    assert list(iter_records(gz)) == list(iter_records(plain))
    # attributes field carries codec id 1
    (attrs,) = struct.unpack(">h", gz[21:23])
    assert attrs & 0x07 == 1

    bad = bytearray(gz)
    bad[50] ^= 0x01  # flip a byte inside the compressed records array
    with pytest.raises(ValueError, match="CRC"):
        list(iter_records(bytes(bad)))

    # valid CRC but truncated/garbled gzip stream → inflate error:
    # rebuild a batch whose "compressed" payload is not gzip at all
    head = gz[:21]
    post = bytearray(gz[21:])
    post[40:] = b"not-a-gzip-stream"
    from eth_dspa_2019_spark.streaming.kafka_wire import crc32c as _crc

    crc = _crc(bytes(post))
    batch_len = 4 + 1 + 4 + len(post)
    head = struct.pack(">qiibI", 5, batch_len, -1, 2, crc)
    with pytest.raises(ValueError, match="inflate"):
        list(iter_records(head + bytes(post)))

    # unsupported codec ids fail by name
    for cid, name in [(2, "snappy"), (3, "lz4"), (4, "zstd")]:
        post2 = bytearray(gz[21:])
        a = struct.unpack(">h", post2[:2])[0] & ~0x07 | cid
        post2[:2] = struct.pack(">h", a)
        crc2 = _crc(bytes(post2))
        h2 = struct.pack(">qiibI", 5, 4 + 1 + 4 + len(post2), -1, 2, crc2)
        with pytest.raises(ValueError, match=name):
            list(iter_records(h2 + bytes(post2)))


def test_gzip_segment_produce_consume(spark, sf_dir, tmp_path):
    """The S8→S1 Spark path with gzip-compressed segments equals the
    uncompressed path record-for-record (same wire schema out)."""
    seg_p = str(tmp_path / "plain-log")
    seg_z = str(tmp_path / "gzip-log")
    lines = synth_activity_lines(spark, sf_dir)
    write_log_segments(lines, seg_p, n_partitions=2, batch_records=97).collect()
    stats = write_log_segments(
        lines, seg_z, n_partitions=2, batch_records=97, codec="gzip"
    ).collect()
    assert sorted(r["partition"] for r in stats) == [0, 1]
    plain = read_log_segments(spark, seg_p)
    gz = read_log_segments(spark, seg_z)
    cols = ["partition", "offset", "timestamp", "value"]
    assert sorted(map(tuple, plain.select(cols).collect())) == sorted(
        map(tuple, gz.select(cols).collect())
    )
