"""Streaming source-drift canary == the batch query, and survives
restarts: per-(source, token) counts are additive sufficient statistics,
so folding them over ANY micro-batch split and reducing at epoch close
must equal `source_token_kl_drift` exactly; a crash after a state commit
must be invisible after restart on the same dirs."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.streaming.source_drift import source_drift_stream


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
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    det = source_drift_stream(
        spark, rglob, docs.schema, str(tmp_path / "ck")
    )
    batch = all_queries()["source_token_kl_drift"].spark(spark, sf_dir)
    assert _rows(det.close_epoch()) == _rows(batch)


def test_stream_crash_restart_exactly_once(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    ck, st = str(tmp_path / "ck"), str(tmp_path / "state")
    try:
        source_drift_stream(
            spark, rglob, docs.schema, ck, st, _fail_at_batch=1
        )
        raise AssertionError("injected crash did not surface")
    except Exception:
        pass
    det = source_drift_stream(spark, rglob, docs.schema, ck, st)
    batch = all_queries()["source_token_kl_drift"].spark(spark, sf_dir)
    assert _rows(det.close_epoch()) == _rows(batch)
    # increment deltas are O(batch-vocab), far below the standing table
    # times the version count (no delta rewrites the whole table)
    total = det.sv.count()
    deltas = glob.glob(f"{st}/v*/sv__delta.parquet")
    assert deltas, "no persisted delta dirs found — layout changed?"
    for d in deltas:
        assert spark.read.parquet(d).count() <= total
