"""Incremental inverted index == one-pass batch index: streaming K
doc-splits into `StreamingPostingsIndex` and searching must reproduce the
oracle-checked `bm25_search_topk` exactly (append-only postings make the
split order irrelevant), including across a crash-restart."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.streaming.postings import postings_index_stream


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _stage_chunks(docs, n_chunks, base):
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    cuts = [lo + (hi - lo) * i // n_chunks for i in range(n_chunks)] + [hi + 1]
    for i, (clo, chi) in enumerate(zip(cuts[:-1], cuts[1:])):
        docs.filter(
            (F.col("doc_id") >= clo) & (F.col("doc_id") < chi)
        ).coalesce(1).write.mode("overwrite").parquet(str(base / f"chunk{i}"))
    return f"{base}/chunk*"


def test_incremental_index_search_equals_batch_query(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    idx = postings_index_stream(
        spark, rglob, docs.schema, str(tmp_path / "ck")
    )
    got = idx.search()
    want = all_queries()["bm25_search_topk"].spark(spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_incremental_index_crash_restart(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    ck, st = str(tmp_path / "ck"), str(tmp_path / "state")
    try:
        postings_index_stream(
            spark, rglob, docs.schema, ck, st, _fail_at_batch=1
        )
        raise AssertionError("injected crash did not surface")
    except Exception:
        pass
    idx = postings_index_stream(spark, rglob, docs.schema, ck, st)
    got = idx.search()
    want = all_queries()["bm25_search_topk"].spark(spark, sf_dir)
    assert _rows(got) == _rows(want)
    # append-only deltas: postings rows across versions sum to the index
    assert idx.tf.count() == idx.tf.select("doc_id", "tok").distinct().count()
