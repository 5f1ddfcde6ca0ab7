"""Kafka wire protocol without a broker: the v2 RecordBatch byte format
(the on-disk/on-wire log segment layout, magic=2) implemented from the
public Kafka protocol spec, so the produce→consume byte path of S1/S8
can be golden-tested end-to-end in this broker-less container.

Layers:

- **Bytes**: :func:`encode_record_batch` / :func:`iter_records` — the
  exact framing a broker stores and the consumer fetch returns:
  CRC32C (Castagnoli, table-driven — Kafka does NOT use zlib's CRC32),
  zigzag-varint record fields, gzip codec via the attribute bits
  (compressed records array, CRC over the compressed bytes — the form
  real brokers ship; snappy/lz4/zstd are rejected loudly), batch header (baseOffset, batchLength,
  partitionLeaderEpoch, magic, crc, attributes, lastOffsetDelta,
  base/maxTimestamp, producerId/Epoch, baseSequence, recordsCount).
  Corruption fails CRC → ValueError (consumer-visible, never silent).
- **Spark producer (S8)**: :func:`write_log_segments` — keyless
  round-robin partitioning (the reference's FlinkKafkaPartitioner
  equivalent), one log-segment file per partition written executor-side
  via ``applyInPandas``, pipe-format ``toString()`` values UTF-8-encoded,
  and a final ``T|partition|date`` tombstone record per partition
  (`SN/Producer.java:77-81` end-of-stream protocol).
- **Spark consumer (S1)**: :func:`read_log_segments` — binaryFile scan →
  Arrow-batched segment decode → the connector's exact wire schema
  (key/value BINARY, topic, partition, offset, timestamp,
  timestampType), ready for ``parse_kafka_frames``.

At 100 TB the segment decode is embarrassingly parallel (one task per
segment file, no shuffle); a real deployment swaps this module for
``format("kafka")`` with the same downstream projection.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# CRC32C (Castagnoli), reflected polynomial 0x82F63B78 — Kafka's batch CRC.

_CRC32C_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC32C_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


# --------------------------------------------------------------------------
# Zigzag varints (protobuf encoding, as the Kafka record format specifies).


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_varint(n: int, out: bytearray) -> None:
    v = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc), pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


# --------------------------------------------------------------------------
# RecordBatch v2.

_MAGIC = 2


def _encode_record(
    offset_delta: int, ts_delta: int, key: bytes | None, value: bytes | None
) -> bytes:
    body = bytearray()
    body.append(0)  # record attributes
    write_varint(ts_delta, body)
    write_varint(offset_delta, body)
    if key is None:
        write_varint(-1, body)
    else:
        write_varint(len(key), body)
        body += key
    if value is None:
        write_varint(-1, body)
    else:
        write_varint(len(value), body)
        body += value
    write_varint(0, body)  # headers count
    out = bytearray()
    write_varint(len(body), out)
    return bytes(out + body)


#: attribute-bit codec ids from the Kafka protocol spec (bits 0-2 of the
#: batch ``attributes`` field). Only gzip is implemented here (stdlib);
#: snappy/lz4/zstd segments are rejected loudly, never mis-decoded.
_CODEC_NONE, _CODEC_GZIP = 0, 1
_CODEC_NAMES = {0: "none", 1: "gzip", 2: "snappy", 3: "lz4", 4: "zstd"}
_CODEC_IDS = {"none": _CODEC_NONE, "gzip": _CODEC_GZIP}


def encode_record_batch(
    base_offset: int,
    records: Iterable[tuple[bytes | None, bytes | None, int]],
    codec: str = "none",
) -> bytes:
    """One v2 batch: ``records`` is (key, value, timestamp_ms) in offset
    order. ``codec`` = ``"none"`` or ``"gzip"`` — per the spec, a
    compressed batch gzips the concatenated records array (everything
    after recordsCount) and sets attribute bits 0-2 to the codec id; the
    CRC covers the COMPRESSED bytes, exactly what a broker stores. No
    producer state (idempotence fields -1) — the plain produce path."""
    recs = list(records)
    if not recs:
        raise ValueError("empty record batch")
    base_ts = recs[0][2]
    max_ts = max(r[2] for r in recs)
    payload = bytearray()
    for i, (k, v, ts) in enumerate(recs):
        payload += _encode_record(i, ts - base_ts, k, v)
    attrs = _CODEC_IDS[codec]
    body = bytes(payload)
    if attrs == _CODEC_GZIP:
        import gzip

        # mtime=0 → deterministic bytes (the gzip header embeds a
        # timestamp otherwise, which would break golden comparisons)
        body = gzip.compress(body, mtime=0)
    # part covered by the CRC: attributes .. records
    post_crc = (
        struct.pack(
            ">hiqqqhii",
            attrs,              # attributes (codec in bits 0-2)
            len(recs) - 1,      # lastOffsetDelta
            base_ts,
            max_ts,
            -1,                 # producerId
            -1,                 # producerEpoch
            -1,                 # baseSequence
            len(recs),
        )
        + body
    )
    crc = crc32c(post_crc)
    # batchLength counts bytes after the batchLength field itself
    batch_len = 4 + 1 + 4 + len(post_crc)  # leaderEpoch + magic + crc + rest
    head = struct.pack(
        ">qiibI", base_offset, batch_len, -1, _MAGIC, crc
    )
    return head + post_crc


def iter_records(buf: bytes) -> Iterator[tuple[int, int, bytes | None, bytes | None]]:
    """Walk a log segment (concatenated v2 batches) → (offset,
    timestamp_ms, key, value) per record. Validates magic, batchLength
    and CRC32C per batch; any mismatch raises ValueError."""
    pos = 0
    while pos < len(buf):
        if pos + 21 > len(buf):
            raise ValueError("truncated batch header")
        base_offset, batch_len = struct.unpack(">qi", buf[pos : pos + 12])
        end = pos + 12 + batch_len
        if end > len(buf):
            raise ValueError("truncated record batch")
        magic = buf[pos + 16]
        if magic != _MAGIC:
            raise ValueError(f"unsupported magic {magic}")
        (crc,) = struct.unpack(">I", buf[pos + 17 : pos + 21])
        post_crc = buf[pos + 21 : end]
        if crc32c(post_crc) != crc:
            raise ValueError(f"CRC mismatch in batch @{pos}")
        attrs, _last_delta, base_ts, _max_ts, _pid, _pep, _bseq, n = (
            struct.unpack(">hiqqqhii", post_crc[:40])
        )
        codec = attrs & 0x07
        if codec == _CODEC_GZIP:
            import gzip

            try:
                post_crc = post_crc[:40] + gzip.decompress(post_crc[40:])
            except OSError as ex:
                raise ValueError(f"gzip batch inflate failed: {ex}") from ex
        elif codec:
            raise ValueError(
                "unsupported codec "
                f"{_CODEC_NAMES.get(codec, codec)} in batch @{pos}"
            )
        p = 40
        for _ in range(n):
            rec_len, p = read_varint(post_crc, p)
            rec_end = p + rec_len
            if rec_end > len(post_crc):
                raise ValueError("truncated record")
            p += 1  # record attributes
            ts_delta, p = read_varint(post_crc, p)
            off_delta, p = read_varint(post_crc, p)
            klen, p = read_varint(post_crc, p)
            key = None if klen < 0 else post_crc[p : p + klen]
            p += max(klen, 0)
            vlen, p = read_varint(post_crc, p)
            value = None if vlen < 0 else post_crc[p : p + vlen]
            p += max(vlen, 0)
            nh, p = read_varint(post_crc, p)
            if nh != 0:
                raise ValueError("record headers not supported")
            if p != rec_end:
                raise ValueError("record length mismatch")
            yield base_offset + off_delta, base_ts + ts_delta, key, value
        pos = end


# --------------------------------------------------------------------------
# Spark producer / consumer over segment files.

_SEG_SCHEMA = "partition int, n_records long, n_batches long, n_bytes long"
_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def write_log_segments(
    lines: DataFrame,
    out_dir: str,
    topic: str = "all-multiple",
    n_partitions: int = 4,
    batch_records: int = 200,
    tombstone_date: str = "2019-06-01T00:00:00",
    codec: str = "none",
) -> DataFrame:
    """Produce: keyless round-robin over ``n_partitions``, each partition's
    records framed into v2 batches of ``batch_records`` and written as one
    segment file ``{topic}-{p}.log`` (executor-side, no driver collect),
    ending with the reference's ``T|partition|date`` tombstone record.
    Returns per-partition (n_records incl. tombstone, n_batches, n_bytes)."""
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    routed = lines.select(
        F.monotonically_increasing_id().alias("seq"),
        F.col("value").cast("string").alias("value"),
    ).select(
        (F.col("seq") % n_partitions).cast("int").alias("partition"),
        "seq",
        "value",
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        p = int(pdf["partition"].iloc[0])
        pdf = pdf.sort_values("seq")
        vals = [v.encode("utf-8") for v in pdf["value"]]
        vals.append(f"T|{p}|{tombstone_date}".encode("utf-8"))
        path = os.path.join(out_dir, f"{topic}-{p}.log")
        n_batches = 0
        with open(path, "wb") as f:
            for start in range(0, len(vals), batch_records):
                chunk = vals[start : start + batch_records]
                f.write(
                    encode_record_batch(
                        start,
                        [(None, v, 1556668800000 + start + i)
                         for i, v in enumerate(chunk)],
                        codec=codec,
                    )
                )
                n_batches += 1
        return pd.DataFrame(
            {
                "partition": [p],
                "n_records": [len(vals)],
                "n_batches": [n_batches],
                "n_bytes": [os.path.getsize(path)],
            }
        )

    return routed.groupBy("partition").applyInPandas(_write, _SEG_SCHEMA)


def read_log_segments(
    spark: SparkSession, seg_dir: str, topic: str = "all-multiple"
) -> DataFrame:
    """Consume: binaryFile scan of the segment files → Arrow-batched
    :func:`iter_records` decode → the spark-sql-kafka connector's exact
    wire schema, so everything downstream (``parse_kafka_frames``,
    ``split_side_outputs``) is identical to the live-broker path.
    One task per segment, zero shuffle."""
    import pandas as pd

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"{topic}-*.log")
        .load(seg_dir)
        .select("path", "content")
    )

    def _decode(it):
        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                part = int(os.path.basename(path).rsplit("-", 1)[1][: -len(".log")])
                rows = {
                    "key": [], "value": [], "topic": [], "partition": [],
                    "offset": [], "timestamp": [], "timestampType": [],
                }
                for off, ts_ms, key, value in iter_records(bytes(content)):
                    rows["key"].append(key)
                    rows["value"].append(value)
                    rows["topic"].append(topic)
                    rows["partition"].append(part)
                    rows["offset"].append(off)
                    rows["timestamp"].append(
                        pd.Timestamp(ts_ms, unit="ms")
                    )
                    rows["timestampType"].append(0)
                yield pd.DataFrame(rows)

    return raw.mapInPandas(_decode, _WIRE_SCHEMA)
