"""The reference's FULL job topology as ONE chained streaming run
(VERDICT r6 #3, `SN/SocialNetwork.java:25-52`): raw wire-format lines →
parse (once) → incremental reply→post resolution, fanning out through
exactly-once file hops to ALL THREE tasks — task 1 windowed counts,
task 2 recommender, task 3 anomaly detector — with crashes injected
mid-run at two different stages, each stage resumed on its own
checkpoint + durable state. Every task's output must equal its
oracle-checked batch query; the per-component goldens check the same
equalities in isolation, this test checks them COMPOSED (a stage
replaying after a crash feeds the stage after it — an upstream
duplicate or loss would cascade)."""

from __future__ import annotations

import glob

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
from eth_dspa_2019_spark.sources.activity import (
    load_activities,
    parse_creation_date,
    synth_activity_lines,
)
from eth_dspa_2019_spark.streaming.anomaly import anomaly_stream
from eth_dspa_2019_spark.streaming.recommend import recommend_stream
from eth_dspa_2019_spark.streaming.resolution import (
    resolve_activities_stream,
)
from eth_dspa_2019_spark.streaming.windows import run_to_memory

_K_SPLITS = 4


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_composed_social_pipeline_crash_restart(spark, sf_dir, tmp_path):
    # ---- stage 0: the wire stream as K event-time-ordered line chunks
    # (the replay producer's ordered tape; disorder robustness is pinned
    # separately by test_streaming_pipeline_under_bounded_disorder)
    lines = synth_activity_lines(spark, sf_dir).withColumn(
        "ts_ms",
        F.unix_millis(
            parse_creation_date(F.element_at(F.split("value", r"\|", -1), 4))
        ),
    )
    lo, hi = lines.agg(F.min("ts_ms"), F.max("ts_ms")).collect()[0]
    cuts = [lo + (hi - lo) * i // _K_SPLITS for i in range(_K_SPLITS)]
    cuts.append(hi + 1)
    ldir = tmp_path / "lines"
    for i, (clo, chi) in enumerate(zip(cuts[:-1], cuts[1:])):
        lines.filter(
            (F.col("ts_ms") >= clo) & (F.col("ts_ms") < chi)
        ).select("value").coalesce(1).write.mode("overwrite").text(
            str(ldir / f"chunk{i}")
        )
    lglob = f"{ldir}/chunk*"

    # ---- stage A: parse + resolve, crash after batch 1's state commit,
    # resume on the same checkpoint/state dirs
    rdir = str(tmp_path / "resolved")
    adir = str(tmp_path / "acts")
    ck1, sd1 = str(tmp_path / "ck1"), str(tmp_path / "sd1")
    try:
        resolve_activities_stream(
            spark, lglob, rdir, ck1, state_dir=sd1, acts_out_dir=adir,
            sink_parts=1, _fail_at_batch=1,
        )
        raise AssertionError("injected crash did not fire")
    except Exception as ex:
        assert "injected crash" in str(ex)
    resolver = resolve_activities_stream(
        spark, lglob, rdir, ck1, state_dir=sd1, acts_out_dir=adir,
        sink_parts=1,
    )
    assert resolver.pending.count() == 0

    # the silver hop equals the batch resolution (exact multiset — a
    # replayed batch that appended instead of rewriting would fail), and
    # the bronze hop equals the batch parse
    emitted = spark.read.parquet(f"{rdir}/batch-*")
    batch_resolved = _resolved(spark, sf_dir).select(
        "kind", "id", "person_id", "ts_ms", "post_id"
    )
    assert _rows(emitted) == _rows(batch_resolved)
    acts_cols = ["ts_ms", "id", "kind", "person_id", "content"]
    acts_emitted = spark.read.parquet(f"{adir}/batch-*").select(*acts_cols)
    acts_batch = load_activities(spark, sf_dir).select(*acts_cols)
    assert _rows(acts_emitted) == _rows(acts_batch)

    # ---- stage B1 (task 1): windowed per-post comment counts over the
    # resolved hop, consumed as its own stream
    res_stream = (
        spark.readStream.schema(emitted.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{rdir}/batch-*")
        .withColumn("ets", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ets", "30 minutes")
    )
    counts = (
        res_stream.groupBy(
            F.window("ets", "12 hours", "30 minutes").alias("w"), "post_id"
        )
        .agg(
            F.sum(F.when(F.col("kind") == "comment", 1).otherwise(0)).alias(
                "n_comments"
            )
        )
        .select(
            F.col("w.end").cast("long").alias("window_end"),
            "post_id",
            "n_comments",
        )
    )
    got1 = run_to_memory(counts, str(tmp_path / "ck_t1"), "append")
    t1_batch = all_queries()["task1_comment_counts"].spark(spark, sf_dir)
    t1_cols = ["window_end", "post_id", "n_comments"]
    got1_rows = set(map(tuple, got1.select(*t1_cols).collect()))
    t1_rows = set(map(tuple, t1_batch.select(*t1_cols).collect()))
    assert got1_rows and got1_rows <= t1_rows
    t1_closed = max(r[0] for r in got1_rows)
    assert not {r for r in t1_rows - got1_rows if r[0] <= t1_closed}

    # ---- stage B2 (task 2): the recommender over the resolved hop, with
    # its OWN mid-run crash + resume — the second failure domain in the
    # same composed run
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    num_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    friends = synth_friend_edges(users, num_users)
    static = static_similarity(
        candidate_grid(users, friends), synth_person_attrs(users)
    )
    ck2, sd2 = str(tmp_path / "ck2"), str(tmp_path / "sd2")
    odir2 = str(tmp_path / "recs")
    try:
        recommend_stream(
            spark, f"{rdir}/batch-*", emitted.schema, static, friends, ck2,
            state_dir=sd2, out_dir=odir2, max_files_per_trigger=1,
            _fail_at_batch=1,
        )
        raise AssertionError("injected crash did not fire")
    except Exception as ex:
        assert "injected crash" in str(ex)
    rec = recommend_stream(
        spark, f"{rdir}/batch-*", emitted.schema, static, friends, ck2,
        state_dir=sd2, out_dir=odir2, max_files_per_trigger=1,
    )
    t2_batch = all_queries()["task2_recommendations"].spark(spark, sf_dir)
    t2_cols = ["window_end", "eigen_id", "rank", "rec_user_id", "score"]
    got2_rows = set(map(tuple, rec.recs.select(*t2_cols).collect()))
    t2_rows = set(map(tuple, t2_batch.select(*t2_cols).collect()))
    assert got2_rows and got2_rows <= t2_rows
    t2_closed = max(r[0] for r in got2_rows)
    assert not {r for r in t2_rows - got2_rows if r[0] <= t2_closed}
    # the emitted sink equals the recovered state exactly (no replay dup)
    sunk2 = spark.read.parquet(f"{odir2}/batch-*")
    assert _rows(sunk2.select(*t2_cols)) == _rows(rec.recs.select(*t2_cols))
    # O(batch) state writes: version deltas partition the accumulated set
    d2 = sorted(glob.glob(f"{sd2}/v*/recs__delta.parquet"))
    assert d2 and sum(
        spark.read.parquet(d).count() for d in d2
    ) == rec.recs.count()

    # ---- stage B3 (task 3): the anomaly detector over the bronze
    # (parsed-activities) hop — fed by the stage that crashed and
    # replayed, so an upstream duplicate would surface here
    ck3, sd3 = str(tmp_path / "ck3"), str(tmp_path / "sd3")
    odir3 = str(tmp_path / "flagged")
    det = anomaly_stream(
        spark,
        f"{adir}/batch-*",
        acts_emitted.schema,
        odir3,
        ck3,
        state_dir=sd3,
    )
    t3_batch = all_queries()["task3_anomalies"].spark(spark, sf_dir)
    assert _rows(det.anomalies()) == _rows(t3_batch)
    assert _rows(spark.read.parquet(f"{odir3}/batch-*")) == _rows(t3_batch)
