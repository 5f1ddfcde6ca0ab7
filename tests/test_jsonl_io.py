"""JSONL corpus interchange round-trip (io/jsonl.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.jsonl import (
    DOCUMENTS_JSONL_SCHEMA,
    read_jsonl,
    write_jsonl,
)
from eth_dspa_2019_spark.io.readers import load_table


def _canon(df):
    return sorted(tuple(r) for r in df.select("doc_id", "text", "lang", "source", "n_chars").collect())


def test_jsonl_round_trip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(docs, path, shards=4)
    back = read_jsonl(spark, path)
    assert back.schema == DOCUMENTS_JSONL_SCHEMA
    assert _canon(back) == _canon(docs)


def test_jsonl_round_trip_gzip(spark, sf_dir, tmp_path):
    import glob

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_gz")
    write_jsonl(docs, path, shards=2, compression="gzip")
    assert glob.glob(path + "/*.json.gz")
    back = read_jsonl(spark, path)
    assert _canon(back) == _canon(docs)


def test_jsonl_no_inference_job(spark, sf_dir, tmp_path):
    """Declared schema means the read plans directly against the files —
    reading back a projection must show pruned ReadSchema, and malformed
    rows must not poison the typed columns."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "corpus_prune")
    write_jsonl(docs, path, shards=1)
    back = read_jsonl(spark, path).select("doc_id", "lang")
    plan = back._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema  # wide column pruned from the json scan
    assert back.count() == docs.count()


def test_jsonl_quarantine_side_output(spark, tmp_path):
    from eth_dspa_2019_spark.io.jsonl import read_jsonl_with_quarantine

    path = tmp_path / "mixed"
    path.mkdir()
    (path / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "web", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "web", "n_chars": 7}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    good, bad = read_jsonl_with_quarantine(spark, str(path))
    assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
    bad_lines = sorted(r["raw_line"] for r in bad.collect())
    assert len(bad_lines) == 2
    assert "not json" in bad_lines[1] or "not json" in bad_lines[0]
    assert "_corrupt_record" not in good.columns
