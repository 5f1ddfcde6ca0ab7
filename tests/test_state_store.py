"""O6/O8: RocksDB state store provider + StreamingQueryProgress surface.

``spark.sql.streaming.stateStore.providerClass`` is a runtime SQL conf —
set it on the shared session for the streaming run, restore afterwards."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.streaming import (
    run_to_memory,
    stream_events,
    tumbling_counts_stream,
)
from eth_dspa_2019_spark.streaming.windows import ROCKSDB_STATE_CONF


def test_rocksdb_state_store_and_progress(spark, sf_dir, tmp_path):
    saved = {k: spark.conf.get(k, None) for k in ROCKSDB_STATE_CONF}
    for k, v in ROCKSDB_STATE_CONF.items():
        spark.conf.set(k, v)
    try:
        progress: list = []
        stream = tumbling_counts_stream(stream_events(spark, sf_dir))
        got = run_to_memory(
            stream,
            str(tmp_path / "ckpt"),
            "complete",
            collect_progress=progress,
        )
        batch_n = (
            load_table(spark, sf_dir, "events")
            .groupBy(F.window("ts", "30 minutes"), "event_type")
            .count()
            .count()
        )
        assert got.count() == batch_n
        # O8: frontier surfaced — watermark + state rows visible per batch
        assert progress, "no StreamingQueryProgress collected"
        last = progress[-1]
        assert "eventTime" in last and "stateOperators" in last
        assert last["stateOperators"][0]["numRowsTotal"] > 0
        # the state store actually used RocksDB
        assert "rocksdb" in str(last["stateOperators"][0]).lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_checkpoint_restart_resumes_state(spark, sf_dir, tmp_path):
    """O6: a restarted query on the same checkpoint ingests ONLY new files
    and its recovered state still carries the first run's aggregates — the
    reference's checkpoint/restart story
    (`session-9/.../FlinkKafkaConsumer.java:66-73`)."""
    import os

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    a.coalesce(1).write.mode("append").parquet(src)

    def run(name):
        stream = (
            spark.readStream.schema(ev.schema)
            .parquet(src)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = [p for p in q.recentProgress]
        return (
            {r["event_type"]: r["n"] for r in spark.table(name).collect()},
            progress,
        )

    first, _ = run("restart_t1")
    assert first == {
        r["event_type"]: r["n"]
        for r in a.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    b.coalesce(1).write.mode("append").parquet(src)
    second, progress2 = run("restart_t2")
    # recovered state + only-new input → totals over a ∪ b
    assert second == {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    rows_read = sum(p.numInputRows for p in progress2)
    assert rows_read <= b.count()  # file A was NOT re-ingested


def test_resolver_snapshot_writes_are_o_batch(spark, tmp_path):
    """Verdict r4 #4/#5: each committed version persists `resolved` as the
    BATCH's delta (rows resolved that batch), not the full history; full
    compactions appear only at the COMPACT_EVERY cadence (plus the initial
    base), and reconstruction equals the in-memory state."""
    from eth_dspa_2019_spark.streaming.resolution import (
        _RESOLVED_SCHEMA,
        COMPACT_EVERY,
        IncrementalResolver,
    )

    n_batches, per_batch = 5, 40
    assert n_batches < COMPACT_EVERY  # only v0 should hold a compaction
    sdir = str(tmp_path / "state")
    r = IncrementalResolver(spark, state_dir=sdir)
    # batch b: comments with ids [b*100, b*100+per_batch) — each batch
    # resolves exactly its own rows, so the expected delta size is known
    for b in range(n_batches):
        rows = [(b * 100 + i, "comment", 7, None) for i in range(per_batch)]
        acts = spark.createDataFrame(
            rows, "id long, kind string, post_id long, parent_id long"
        )
        r.begin_batch(b)
        r.process_batch(acts)
        r.commit(b)

    fs_root = tmp_path / "state"
    delta_rows = {}
    for b in range(n_batches):
        vdir = fs_root / f"v{b}"
        assert (vdir / "_COMMITTED").exists()
        assert (vdir / "resolved__delta.parquet").exists()
        has_full = (vdir / "resolved__full.parquet").exists()
        assert has_full == (b == 0), f"unexpected compaction layout at v{b}"
        delta_rows[b] = (
            spark.read.schema(_RESOLVED_SCHEMA)
            .parquet(str(vdir / "resolved__delta.parquet"))
            .count()
        )
    # O(batch): every delta is exactly the batch's resolutions
    assert delta_rows == {b: per_batch for b in range(n_batches)}
    # reconstruction across base + deltas equals the live state
    fresh = IncrementalResolver(spark, state_dir=sdir)
    assert fresh.resolved.count() == n_batches * per_batch
    assert sorted(map(tuple, fresh.resolved.collect())) == sorted(
        map(tuple, r.resolved.collect())
    )


def test_resolver_compaction_prunes_old_versions(spark, tmp_path):
    """Crossing a compaction boundary prunes versions below the previous
    base while keeping the rollback target reconstructable."""
    from eth_dspa_2019_spark.streaming.resolution import (
        COMPACT_EVERY,
        IncrementalResolver,
    )

    sdir = str(tmp_path / "state")
    r = IncrementalResolver(spark, state_dir=sdir)
    n_batches = COMPACT_EVERY + 2  # commits v0..v{CE+1}; v{CE} compacts
    for b in range(n_batches):
        acts = spark.createDataFrame(
            [(b, "comment", 1, None)],
            "id long, kind string, post_id long, parent_id long",
        )
        r.begin_batch(b)
        r.process_batch(acts)
        r.commit(b)
    live = sorted(
        int(p.name[1:])
        for p in (tmp_path / "state").iterdir()
        if p.name.startswith("v")
    )
    # after v{CE+1}: newest base <= CE is CE itself -> v0..v{CE-1} pruned
    assert live == [COMPACT_EVERY, COMPACT_EVERY + 1]
    fresh = IncrementalResolver(spark, state_dir=sdir)
    assert fresh.resolved.count() == n_batches
    # rollback target (one version back) is still loadable
    fresh.begin_batch(n_batches - 1)
    assert fresh.resolved.count() == n_batches - 1


def test_state_store_missing_table_raises(spark, tmp_path):
    """ADVICE r4 (medium): a committed snapshot with a missing table must
    raise, not silently reset resolver state to empty."""
    import pytest

    from eth_dspa_2019_spark.streaming.resolution import (
        _PARKED_SCHEMA,
        _StateStore,
        IncrementalResolver,
    )

    sdir = str(tmp_path / "state")
    r = IncrementalResolver(spark, state_dir=sdir)
    acts = spark.createDataFrame(
        [(1, "comment", 9, None)],
        "id long, kind string, post_id long, parent_id long",
    )
    r.begin_batch(0)
    r.process_batch(acts)
    r.commit(0)  # commits resolved+pending but no 'parked' extra

    store = _StateStore(spark, sdir)
    with pytest.raises(FileNotFoundError, match="parked"):
        store.load(0, "parked", _PARKED_SCHEMA)
    # version None / < 0 keeps the legitimate empty-state path
    assert store.load(None, "parked", _PARKED_SCHEMA).count() == 0
    assert store.load(-1, "parked", _PARKED_SCHEMA).count() == 0
    # a state_dir whose snapshots lack any 'resolved' base also raises
    with pytest.raises(FileNotFoundError, match="resolved_missing"):
        store.load_chain(0, "resolved_missing", "id long, root_post_id long")


def test_durable_tables_lifecycle(spark, tmp_path):
    """The shared DurableTables harness (`streaming/durable.py`) through a
    full life: 12 commits (> COMPACT_EVERY), a crash-replay rollback in
    the middle, delta-chain reconstruction, and the pruning bound (at
    most COMPACT_EVERY+1 delta dirs plus one compaction base retained)."""
    from eth_dspa_2019_spark.streaming.durable import (
        COMPACT_EVERY,
        DurableTables,
    )

    sdir = str(tmp_path / "state")
    fulls = {"cursor": "k long, v long"}
    deltas = {"log": "batch long, x long"}

    def mk():
        return DurableTables(spark, sdir, fulls, deltas)

    dt = mk()
    acc = spark.createDataFrame([], deltas["log"])
    for b in range(8):
        assert dt.begin_batch(b) is None  # fresh ids never roll back
        d = spark.createDataFrame([(b, b * 10)], deltas["log"])
        acc = acc.unionByName(d)
        cur = spark.createDataFrame([(0, b)], fulls["cursor"])
        dt.commit(b, {"cursor": cur}, {"log": d}, {"log": acc})

    # fresh process: recovers all 8 batches through the delta chain
    dt2 = mk()
    t = dt2.load_latest()
    assert sorted(r["batch"] for r in t["log"].collect()) == list(range(8))
    assert t["cursor"].collect()[0]["v"] == 7

    # crash-replay: the engine re-runs batch 7 → state must roll back one
    # version and re-absorb the batch without duplicating its delta
    rolled = dt2.begin_batch(7)
    assert rolled is not None
    assert sorted(r["batch"] for r in rolled["log"].collect()) == list(range(7))
    acc2 = rolled["log"]
    d = spark.createDataFrame([(7, 999)], deltas["log"])  # new content
    acc2 = acc2.unionByName(d)
    dt2.commit(7, {"cursor": spark.createDataFrame([(0, 70)], fulls["cursor"])},
               {"log": d}, {"log": acc2})
    for b in range(8, 12):
        assert dt2.begin_batch(b) is None
        d = spark.createDataFrame([(b, b * 10)], deltas["log"])
        acc2 = acc2.unionByName(d)
        dt2.commit(b, {"cursor": spark.createDataFrame([(0, b)], fulls["cursor"])},
                   {"log": d}, {"log": acc2})

    # final recovery sees the REPLAYED batch-7 content, not the original
    t3 = mk().load_latest()
    rows = {r["batch"]: r["x"] for r in t3["log"].collect()}
    assert rows[7] == 999
    assert sorted(rows) == list(range(12))

    # pruning bound: versions below the newest compaction at-or-below the
    # previous batch are gone; the directory never grows with the stream
    import glob

    vdirs = sorted(glob.glob(f"{sdir}/v*"))
    assert len(vdirs) <= COMPACT_EVERY + 2, vdirs


def test_flat_checkpoint_strips_origin_statistics(spark):
    """Regression pin for the round-8 stats blowup: localCheckpoint
    preserves the origin plan's estimated sizeInBytes (join estimation
    multiplies these, compounding geometrically across standing-state
    batches); flat_checkpoint must reset the leaf to the bounded default
    while serving the identical rows without recompute."""
    import pyspark.sql.functions as F

    from eth_dspa_2019_spark.streaming.durable import flat_checkpoint

    a = spark.range(100).withColumn("k", F.col("id") % 7)
    b = spark.range(50).withColumn("k", F.col("id") % 7)
    j = a.join(b.withColumnRenamed("id", "id2"), "k").join(
        a.withColumnRenamed("id", "id3"), "k"
    )

    def bits(df):
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        ).bit_length()

    flat = flat_checkpoint(j)
    assert bits(flat) <= 64, bits(flat)
    assert sorted(map(tuple, flat.collect())) == sorted(
        map(tuple, j.collect())
    )
    # and the compounding scenario stays bounded: re-checkpoint a plan
    # that references the previous checkpoint several times, repeatedly
    st = flat
    for _ in range(5):
        st = flat_checkpoint(
            st.alias("x").join(st.alias("y"), "k").limit(10)
        )
    assert bits(st) <= 64, bits(st)
