"""Streaming corpus chunking: the map-only chunk fan-out must run
unchanged as a streaming transformation (stateless operators are
batch/stream-unified in Spark) and produce exactly the batch result."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.jsonl import DOCUMENTS_JSONL_SCHEMA, write_jsonl
from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.streaming import run_to_memory


def _chunk_spans(docs):
    """The registered chunk projection, driven directly (same code path as
    doc_chunk_spans — no duplicated expressions that could drift)."""
    from eth_dspa_2019_spark.plans.corpus import chunk_spans

    return chunk_spans(docs)


def test_streaming_chunker_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    corpus = str(tmp_path / "corpus")
    write_jsonl(docs, corpus, shards=3)  # 3 shard files -> >=1 micro-batch

    stream = (
        spark.readStream.schema(DOCUMENTS_JSONL_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .json(corpus)
    )
    out = run_to_memory(
        _chunk_spans(stream),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got = sorted(tuple(r) for r in out.collect())
    expected = sorted(tuple(r) for r in _chunk_spans(docs).collect())
    assert got == expected and len(got) > 0
