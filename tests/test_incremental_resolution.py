"""Incremental (streaming) reply resolution == batch fixpoint — including
adversarial arrival order (children before parents), the case the reference
handles with event-time timers (`PostIdResolver.java:167-214`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.operators.resolve import resolve_post_ids
from eth_dspa_2019_spark.schemas import KIND_COMMENT, KIND_REPLY
from eth_dspa_2019_spark.sources.activity import load_activities
from eth_dspa_2019_spark.streaming.resolution import (
    IncrementalResolver,
    resolve_lines_stream,
)


def _mapping_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_incremental_equals_batch_in_order(spark, sf_dir):
    acts = load_activities(spark, sf_dir)
    batch = resolve_post_ids(acts)
    r = IncrementalResolver(spark)
    # three arrival chunks in timestamp order
    for lo, hi in [(0, 300), (300, 700), (700, 10**9)]:
        r.process_batch(acts.filter((F.col("id") >= lo) & (F.col("id") < hi)))
    assert r.pending.count() == 0
    assert _mapping_rows(r.mappings()) == _mapping_rows(
        batch.select(F.col("id").alias("child_id"), "root_post_id")
    )


def test_incremental_reverse_order_parks_then_resolves(spark):
    """Children arrive a batch BEFORE their parents: they must wait in
    pending state and resolve once the parents show up — the timer-retry
    semantics without timers."""
    rows = [(0, KIND_COMMENT, 100, None)] + [
        (i, KIND_REPLY, None, i - 1) for i in range(1, 6)
    ]
    acts = spark.createDataFrame(
        rows, "id long, kind string, post_id long, parent_id long"
    )
    r = IncrementalResolver(spark)
    r.process_batch(acts.filter(F.col("id") >= 3))  # deep tail first
    assert r.pending.count() == 3  # all parked, nothing resolvable
    assert r.resolved.count() == 0
    r.process_batch(acts.filter(F.col("id") < 3))  # parents arrive
    assert r.pending.count() == 0
    got = {r_["child_id"]: r_["root_post_id"] for r_ in r.mappings().collect()}
    assert got == {i: 100 for i in range(6)}


def test_foreachbatch_stream_resolution(spark, sf_dir, tmp_path):
    """End-to-end: text-file micro-batches → parser → foreachBatch state
    fold equals the batch fixpoint."""
    from eth_dspa_2019_spark.sources.activity import synth_activity_lines

    lines = synth_activity_lines(spark, sf_dir).withColumn(
        "part", (F.crc32(F.col("value")) % 3).cast("int")
    )
    ldir = str(tmp_path / "lines")
    lines.write.partitionBy("part").mode("overwrite").text(ldir)
    resolver = resolve_lines_stream(
        spark, f"{ldir}/part=*", str(tmp_path / "ckpt")
    )
    assert resolver.pending.count() == 0
    batch = resolve_post_ids(load_activities(spark, sf_dir))
    assert _mapping_rows(resolver.mappings()) == _mapping_rows(
        batch.select(F.col("id").alias("child_id"), "root_post_id")
    )
