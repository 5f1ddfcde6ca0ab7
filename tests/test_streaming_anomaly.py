"""Streaming Task 3 anomaly flagging == the batch oracle-checked query,
regardless of micro-batch boundaries (event-time-ordered chunks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.sources.activity import load_activities
from eth_dspa_2019_spark.streaming.anomaly import StreamingAnomalyDetector


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_anomalies_equal_batch(spark, sf_dir):
    acts = load_activities(spark, sf_dir)
    batch = all_queries()["task3_anomalies"].spark(spark, sf_dir)

    det = StreamingAnomalyDetector(spark)
    # three uneven event-TIME-ordered chunks (ids don't follow event time
    # for likes, whose id is the liked post's id — chunk on ts_ms)
    lo_ts, hi_ts = acts.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    c1 = lo_ts + (hi_ts - lo_ts) // 7
    c2 = lo_ts + (hi_ts - lo_ts) // 2
    for lo, hi in [(lo_ts, c1), (c1, c2), (c2, hi_ts + 1)]:
        det.process_batch(
            acts.filter((F.col("ts_ms") >= lo) & (F.col("ts_ms") < hi))
        )
    assert _rows(det.anomalies()) == _rows(batch)


def test_streaming_anomalies_single_batch(spark, sf_dir):
    acts = load_activities(spark, sf_dir)
    batch = all_queries()["task3_anomalies"].spark(spark, sf_dir)
    det = StreamingAnomalyDetector(spark)
    det.process_batch(acts)
    assert _rows(det.anomalies()) == _rows(batch)


def test_streaming_fold_has_no_single_partition_window(spark, sf_dir):
    """VERDICT r5 #2: the per-batch cumulative fold must use the
    range-prefix two-stage plan, never an unkeyed ``Window.orderBy``
    funneling the whole micro-batch through one reducer."""
    acts = load_activities(spark, sf_dir)
    det = StreamingAnomalyDetector(spark)
    caches = []
    scored = det._scored(acts, cache_registry=caches)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" in plan
    for c in caches:
        c.unpersist()


def _ts_chunks(acts, n):
    from pyspark.sql import functions as F2

    lo, hi = acts.agg(F2.min("ts_ms"), F2.max("ts_ms")).collect()[0]
    cuts = [lo + (hi - lo) * i // n for i in range(n)] + [hi + 1]
    return list(zip(cuts[:-1], cuts[1:]))


def test_anomaly_stream_crash_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill/restart mid-stream on the same checkpoint + state dirs
    reproduces the batch anomaly set EXACTLY (VERDICT r5 #1): the crash
    fires after batch 2's state commit but before the engine's offset
    commit — on restart the detector must detect the replayed batch_id,
    roll back one version, and rewrite the batch's output idempotently.
    Also asserts the per-batch state writes are O(batch): each committed
    version's flagged delta holds only that batch's newly-flagged rows."""
    from eth_dspa_2019_spark.streaming.anomaly import anomaly_stream

    acts = load_activities(spark, sf_dir).select(
        "ts_ms", "id", "kind", "person_id", "content"
    )
    cdir = tmp_path / "chunks"
    chunks = _ts_chunks(acts, 4)
    for i, (lo, hi) in enumerate(chunks):  # sequential → mod-time order
        acts.filter((F.col("ts_ms") >= lo) & (F.col("ts_ms") < hi)).coalesce(
            1
        ).write.mode("overwrite").parquet(str(cdir / f"chunk{i}"))
    out_dir = str(tmp_path / "flagged")
    ck = str(tmp_path / "ck")
    sdir = str(tmp_path / "state")

    try:
        anomaly_stream(
            spark, f"{cdir}/chunk*", acts.schema, out_dir, ck,
            state_dir=sdir, _fail_at_batch=2,
        )
        raise AssertionError("injected crash did not fire")
    except Exception as ex:
        assert "injected crash" in str(ex)

    det = anomaly_stream(
        spark, f"{cdir}/chunk*", acts.schema, out_dir, ck, state_dir=sdir
    )
    batch = all_queries()["task3_anomalies"].spark(spark, sf_dir)
    # recovered in-memory state == batch
    assert _rows(det.anomalies()) == _rows(batch)
    # the emitted per-batch sink too (exact multiset — a replay-duplicated
    # emission would fail)
    emitted = spark.read.parquet(f"{out_dir}/batch-*")
    assert _rows(emitted) == _rows(batch)
    # O(batch) persistence: deltas across versions partition the flagged
    # set (their counts sum to the total — nothing rewritten per batch)
    import glob

    deltas = sorted(glob.glob(f"{sdir}/v*/flagged__delta.parquet"))
    n_total = sum(
        spark.read.parquet(d).count() for d in deltas
    )
    assert len(deltas) == 4
    assert n_total == emitted.count()


def test_detector_restart_resumes_from_snapshot(spark, sf_dir, tmp_path):
    """Manual-drive form: commit per batch, drop the object after batch 1,
    build a fresh detector on the same state_dir — it must resume with the
    carried sums/ring buffers and finish to the exact batch result."""
    acts = load_activities(spark, sf_dir)
    batch = all_queries()["task3_anomalies"].spark(spark, sf_dir)
    sdir = str(tmp_path / "state")
    chunks = _ts_chunks(acts, 3)

    det = StreamingAnomalyDetector(spark, state_dir=sdir)
    for bid, (lo, hi) in enumerate(chunks[:2]):
        det.begin_batch(bid)
        det.process_batch(
            acts.filter((F.col("ts_ms") >= lo) & (F.col("ts_ms") < hi))
        )
        det.commit(bid)
    del det

    det2 = StreamingAnomalyDetector(spark, state_dir=sdir)
    lo, hi = chunks[2]
    det2.begin_batch(2)
    det2.process_batch(
        acts.filter((F.col("ts_ms") >= lo) & (F.col("ts_ms") < hi))
    )
    det2.commit(2)
    assert _rows(det2.anomalies()) == _rows(batch)
