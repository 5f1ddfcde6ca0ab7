"""Streaming Task 2 == batch: the resolved stream's closed 4h/1h windows,
folded into similarities + top-5 per window, must equal the oracle-checked
batch `task2_recommendations` for every window the watermark closed."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.operators.recommend import (
    candidate_grid,
    static_similarity,
    synth_friend_edges,
    synth_person_attrs,
)
from eth_dspa_2019_spark.plans.registry import all_queries
from eth_dspa_2019_spark.plans.social import _resolved
from eth_dspa_2019_spark.streaming.recommend import recommend_stream


def test_streaming_task2_equals_batch_prefix(spark, sf_dir, tmp_path):
    # stage the resolved activity stream as a parquet landing dir
    resolved = _resolved(spark, sf_dir).select(
        "kind", "id", "person_id", "ts_ms", "post_id"
    )
    rdir = str(tmp_path / "resolved")
    resolved.repartition(3).write.mode("overwrite").parquet(rdir)

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    num_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    friends = synth_friend_edges(users, num_users)
    static = static_similarity(
        candidate_grid(users, friends), synth_person_attrs(users)
    )

    rec = recommend_stream(
        spark,
        rdir,
        resolved.schema,
        static,
        friends,
        str(tmp_path / "ck"),
    )
    got = rec.recs
    batch = all_queries()["task2_recommendations"].spark(spark, sf_dir)
    cols = ["window_end", "eigen_id", "rank", "rec_user_id", "score"]
    got_rows = set(map(tuple, got.select(*cols).collect()))
    batch_rows = set(map(tuple, batch.select(*cols).collect()))
    assert got_rows and got_rows <= batch_rows
    # complete for every window at or before the last closed one
    max_closed = max(r[0] for r in got_rows)
    missing = {r for r in batch_rows - got_rows if r[0] <= max_closed}
    assert not missing


def test_recommend_stream_crash_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill/restart mid-stream on the same checkpoint + state dirs loses
    nothing and duplicates nothing (VERDICT r5 #1): the crash fires after
    a batch's state commit but before the engine's offset commit; on
    restart the recommender rolls back one version and the replayed
    batch's output rewrites the same ``batch-{id}`` directory. Also
    asserts O(batch) persistence: the per-version recs deltas partition
    the accumulated set."""
    import glob

    resolved = _resolved(spark, sf_dir).select(
        "kind", "id", "person_id", "ts_ms", "post_id"
    )
    # event-time-ordered chunk files: per-trigger progress must not let
    # the watermark run ahead of unseen data (see recommend_stream doc)
    rdir = tmp_path / "resolved"
    lo, hi = resolved.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    cuts = [lo + (hi - lo) * i // 4 for i in range(4)] + [hi + 1]
    for i, (clo, chi) in enumerate(zip(cuts[:-1], cuts[1:])):
        resolved.filter(
            (F.col("ts_ms") >= clo) & (F.col("ts_ms") < chi)
        ).coalesce(1).write.mode("overwrite").parquet(str(rdir / f"chunk{i}"))
    rglob = f"{rdir}/chunk*"

    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    num_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    friends = synth_friend_edges(users, num_users)
    static = static_similarity(
        candidate_grid(users, friends), synth_person_attrs(users)
    )
    ck = str(tmp_path / "ck")
    sdir = str(tmp_path / "state")
    odir = str(tmp_path / "recs")

    try:
        recommend_stream(
            spark, rglob, resolved.schema, static, friends, ck,
            state_dir=sdir, out_dir=odir, max_files_per_trigger=1,
            _fail_at_batch=1,
        )
        raise AssertionError("injected crash did not fire")
    except Exception as ex:
        assert "injected crash" in str(ex)

    rec = recommend_stream(
        spark, rglob, resolved.schema, static, friends, ck,
        state_dir=sdir, out_dir=odir, max_files_per_trigger=1,
    )
    batch = all_queries()["task2_recommendations"].spark(spark, sf_dir)
    cols = ["window_end", "eigen_id", "rank", "rec_user_id", "score"]
    got_rows = set(map(tuple, rec.recs.select(*cols).collect()))
    batch_rows = set(map(tuple, batch.select(*cols).collect()))
    assert got_rows and got_rows <= batch_rows
    max_closed = max(r[0] for r in got_rows)
    assert not {r for r in batch_rows - got_rows if r[0] <= max_closed}
    # the emitted per-batch sink equals the recovered state EXACTLY as a
    # multiset — a replay-duplicated emission would fail
    emitted = spark.read.parquet(f"{odir}/batch-*")
    assert sorted(map(tuple, emitted.select(*cols).collect())) == sorted(
        map(tuple, rec.recs.select(*cols).collect())
    )
    # O(batch) persistence: version deltas partition the accumulated set
    deltas = sorted(glob.glob(f"{sdir}/v*/recs__delta.parquet"))
    assert deltas
    n_total = sum(spark.read.parquet(d).count() for d in deltas)
    assert n_total == rec.recs.count()
