"""Streaming negative sampling == the batch query, and survives restarts:

- the per-bucket champion election (min by (hv, doc_id)) is associative,
  so folding it over ANY micro-batch split of the corpus and then running
  the map-only epoch probe pass must equal `negative_sampling_pairs`
  exactly;
- a crash after a batch's state commit must be invisible after restart on
  the same dirs: same epoch output, champion dimension stays B rows, and
  the silver deltas stay O(batch) per version.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.plans.pipeline import NEG_BUCKETS
from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.streaming.negative_sampling import (
    negative_sampling_stream,
)


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


def test_stream_epoch_equals_batch_query(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    det = negative_sampling_stream(
        spark, rglob, docs.schema, str(tmp_path / "ck")
    )
    batch = all_queries()["negative_sampling_pairs"].spark(spark, sf_dir)
    assert _rows(det.close_epoch()) == _rows(batch)
    # the standing dimension is B rows (every bucket hit at this corpus)
    assert det.champions.count() == NEG_BUCKETS
    # silver table holds exactly the non-null-text corpus
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    assert det.silver.count() == n_docs


def test_stream_crash_restart_exactly_once(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    ck, st = str(tmp_path / "ck"), str(tmp_path / "state")
    try:
        negative_sampling_stream(
            spark, rglob, docs.schema, ck, st, _fail_at_batch=1
        )
        raise AssertionError("injected crash did not surface")
    except Exception:
        pass
    det = negative_sampling_stream(spark, rglob, docs.schema, ck, st)
    batch = all_queries()["negative_sampling_pairs"].spark(spark, sf_dir)
    assert _rows(det.close_epoch()) == _rows(batch)
    # O(batch) deltas: no silver delta re-writes the whole corpus
    total = det.silver.count()
    deltas = glob.glob(f"{st}/v*/silver__delta.parquet")
    assert deltas, "no persisted delta dirs found — layout changed?"
    for d in deltas:
        assert spark.read.parquet(d).count() < total
