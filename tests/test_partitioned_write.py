"""Partitioned corpus output: hive layout + dynamic partition overwrite
(re-running one slice must not wipe the others)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.io.writers import write_partitioned


def test_dynamic_overwrite_replaces_only_touched_partitions(
    spark, sf_dir, tmp_path
):
    out = str(tmp_path / "corpus")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    write_partitioned(docs, out, ["lang"])
    langs = {
        d.split("=", 1)[1]
        for d in os.listdir(out)
        if d.startswith("lang=")
    }
    assert "en" in langs and len(langs) >= 2  # hive layout per language
    before_en = spark.read.parquet(out).filter(F.col("lang") == "en").count()

    # re-run ONLY the non-en slice with a marker change
    patch = docs.filter(F.col("lang") != "en").withColumn(
        "text", F.lit("patched")
    )
    write_partitioned(patch, out, ["lang"])
    got = spark.read.parquet(out)
    # en partition untouched, others replaced
    assert got.filter(F.col("lang") == "en").count() == before_en
    assert (
        got.filter(F.col("lang") == "en").filter(
            F.col("text") == "patched"
        ).count()
        == 0
    )
    non_en = got.filter(F.col("lang") != "en")
    assert non_en.count() == patch.count()
    assert non_en.filter(F.col("text") != "patched").count() == 0


def test_max_records_per_file_splits_output(spark, sf_dir, tmp_path):
    out = str(tmp_path / "sized")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    write_partitioned(
        docs.coalesce(1), out, ["lang"], max_records_per_file=50
    )
    en_files = [
        f
        for f in os.listdir(os.path.join(out, "lang=en"))
        if f.endswith(".parquet")
    ]
    # >= 250 en docs in one task, capped at 50 rows/file -> several files
    assert len(en_files) >= 2


def test_partitioned_read_prunes_partitions(spark, sf_dir, tmp_path):
    """Reading the partitioned layout back with a partition predicate must
    prune at the directory level — PartitionFilters in the scan, only the
    matching lang read."""
    out = str(tmp_path / "pruned")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    write_partitioned(docs, out, ["lang"])
    df = spark.read.parquet(out).filter(F.col("lang") == "de")
    plan = df._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "lang" in pf[0]  # predicate reached the partition level
    assert df.count() == docs.filter(F.col("lang") == "de").count()
