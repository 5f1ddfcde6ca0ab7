"""JSONL corpus interchange: the standard on-disk format LLM training
corpora ship in (one JSON object per line, typically gzip-compressed,
sharded into many files).

Spark-native design: ``spark.read.json`` with an EXPLICIT schema — never
schema inference, which costs a full extra pass over 100 TB and can
silently widen/narrow types between shards — and ``DataFrameWriter.json``
with shard-count control. Compression is codec-pluggable (gzip for
interchange, none for speed); Spark splits uncompressed and bgzip'd
inputs per-block, while plain .gz files are one partition each — so the
writer defaults to MANY files (one per task), which is exactly the
sharded layout `training_shard_layout` assigns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# the documents-table schema in JSONL form (doc_id, text, lang, source,
# n_chars) — the interchange contract for corpus import/export
DOCUMENTS_JSONL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def write_jsonl(
    df: DataFrame,
    path: str,
    *,
    shards: int | None = None,
    compression: str | None = None,
) -> None:
    """Write a corpus frame as sharded JSONL.

    ``shards`` repartitions to a fixed file count (one file per task);
    None keeps the input partitioning — the right choice when the frame
    is already laid out (e.g. by `training_shard_layout`), since a
    repartition here would be a pure extra shuffle.
    """
    out = df.repartition(shards) if shards else df
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_JSONL_SCHEMA,
) -> DataFrame:
    """Read a JSONL corpus with a declared schema (no inference pass).

    Malformed lines surface as all-NULL rows under the default PERMISSIVE
    mode; use :func:`read_jsonl_with_quarantine` to capture them as a
    side output instead (querying a json-source ``_corrupt_record``
    column directly is restricted by Spark unless the frame is cached)."""
    return spark.read.schema(schema).json(path)


def read_jsonl_with_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENTS_JSONL_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus, splitting malformed lines into a quarantine
    side output (the P8 side-output pattern at the ingest boundary —
    `sources/activity.py::split_side_outputs` for the social stream,
    this for corpora): returns ``(good, bad)`` where ``bad`` carries the
    raw offending line for repair/audit and ``good`` is schema-clean.

    Implementation: read lines as text, parse with ``from_json`` carrying
    an in-schema corrupt-record column — a malformed line surfaces its raw
    text there, so the split is two map-only filters over one scan, no
    shuffle. (Reading via the json SOURCE and querying ``_corrupt_record``
    hits Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction unless the
    frame is cached; the text+from_json form has no such constraint and
    no cache to leak.)"""
    if "_corrupt_record" in schema.fieldNames():
        raise ValueError(
            "pass the DATA schema only; the corrupt-record column is "
            "managed internally by read_jsonl_with_quarantine"
        )
    q = StructType(schema.fields + [StructField("_corrupt_record", StringType())])
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value").alias("raw_line"),
        F.from_json(
            "value", q, {"columnNameOfCorruptRecord": "_corrupt_record"}
        ).alias("j"),
    )
    # blank/whitespace-only lines parse to a NULL struct (no corrupt-record
    # text) — they are not schema-clean rows and belong in quarantine too
    ok = F.col("j").isNotNull() & F.col("j._corrupt_record").isNull()
    good = parsed.filter(ok).select("j.*").drop("_corrupt_record")
    bad = parsed.filter(~ok).select("raw_line")
    return good, bad
