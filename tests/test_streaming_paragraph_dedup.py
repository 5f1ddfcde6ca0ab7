"""Streaming paragraph dedup == the batch query, and survives restarts:

- over doc_id-ordered micro-batches, "kept in an earlier batch OR elected
  within this batch" IS the batch query's global first-occurrence rule, so
  the union of per-batch outputs must equal `doc_paragraph_dedup` exactly;
- a crash after a batch's state commit (the replay window) must be
  invisible after restart on the same dirs: same outputs, same standing
  hash set, and only O(batch) delta rows per version on disk.
"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.streaming.paragraph_dedup import (
    paragraph_dedup_stream,
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


def test_stream_equals_batch_query(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    odir = str(tmp_path / "out")
    det = paragraph_dedup_stream(
        spark, rglob, docs.schema, odir, str(tmp_path / "ck")
    )
    emitted = spark.read.parquet(f"{odir}/batch-*")
    batch = all_queries()["doc_paragraph_dedup"].spark(spark, sf_dir)
    assert _rows(emitted) == _rows(batch)
    # the standing set is exactly the kept (distinct) paragraphs
    n_kept = batch.agg(
        F.sum(F.col("n_paras") - F.col("n_dropped"))
    ).collect()[0][0]
    assert det.paras.count() == n_kept


def test_stream_crash_restart_exactly_once(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rglob = _stage_chunks(docs, 3, tmp_path / "docs")
    odir, ck, st = (
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
        str(tmp_path / "state"),
    )
    try:
        paragraph_dedup_stream(
            spark, rglob, docs.schema, odir, ck, st, _fail_at_batch=1
        )
        raise AssertionError("injected crash did not surface")
    except Exception:
        pass
    det = paragraph_dedup_stream(spark, rglob, docs.schema, odir, ck, st)
    emitted = spark.read.parquet(f"{odir}/batch-*")
    batch = all_queries()["doc_paragraph_dedup"].spark(spark, sf_dir)
    assert _rows(emitted) == _rows(batch)
    # O(batch) deltas: every persisted paras delta is far smaller than the
    # standing set (the whole point of the versioned-delta layout)
    total = det.paras.count()
    deltas = glob.glob(f"{st}/v*/paras__delta.parquet")
    assert deltas, "no persisted delta dirs found — layout changed?"
    for d in deltas:
        assert spark.read.parquet(d).count() <= total
