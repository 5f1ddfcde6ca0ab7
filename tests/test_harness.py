"""Harness + IO + physical-operator tests: golden diff (T4/U4), disorder
replay (F10/S3), single-writer sinks (S6), side outputs (P8/O5), and the
repartition/broadcast physical ops (P5/P6/P7)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from eth_dspa_2019_spark.harness import (
    assert_golden,
    golden_diff,
    with_random_lateness,
)
from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.io.writers import write_single_csv, write_single_text
from eth_dspa_2019_spark.sources.activity import split_side_outputs


def test_golden_diff(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    assert_golden(ev, ev)
    d = golden_diff(ev, ev.filter(F.col("event_id") != 0))
    assert d == {"extra": 1, "missing": 0}


def test_random_lateness_bounded_and_event_time_invariant(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    late = with_random_lateness(ev, bound_seconds=1800, seed=7)
    bad = late.filter(
        (F.col("arrival_ts") < F.col("ts"))
        | (F.col("arrival_ts") >= F.col("ts") + F.expr("INTERVAL 1800 SECONDS"))
    ).count()
    assert bad == 0
    # event-time windowed counts are disorder-invariant (watermark semantics)
    win = lambda df: sorted(
        tuple(r)
        for r in df.groupBy(F.window("ts", "30 minutes"), "event_type")
        .count()
        .select(F.col("window.start").cast("long"), "event_type", "count")
        .collect()
    )
    assert win(late) == win(ev)


def test_write_single_text_and_csv(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    p = str(tmp_path / "txt_out")
    write_single_text(ev, p)
    parts = glob.glob(os.path.join(p, "part-*"))
    assert len(parts) == 1  # parallelism-1 sink
    back = spark.read.text(p)
    assert back.count() == ev.count()
    write_single_text(ev.limit(5), p)  # overwrite semantics
    assert spark.read.text(p).count() == 5

    c = str(tmp_path / "csv_out")
    write_single_csv(ev, c)
    assert spark.read.option("header", True).csv(c).count() == ev.count()


def test_side_outputs(spark):
    rows = [
        ("P|1|10|2024-01-01T00:00:00|img|ip|Firefox|en|hello world|[1, 2]|5|6",),
        ("C|2|11|2024-01-01T00:10:00.12Z|ip|Chrome|nice post|1||7",),
        ("C|3|12|2024-01-01T00:20:00.123ZZ|ip|Safari|re: nice||2|8",),
        ("L|13|1|2024-01-01T00:30:00",),
        ("T|0|9999-12-31T23:59:59Z",),
        ("X|bad|tag",),
        ("P|4|10|not-a-date|img|ip|Firefox|en|x|[]|5|6",),
    ]
    lines = spark.createDataFrame(rows, "value string")
    outs = split_side_outputs(lines, watermark_ts="2024-01-01 00:15:00")
    main = outs["main"].collect()
    assert sorted(r["kind"] for r in main) == ["comment", "like", "post", "reply"]
    by_kind = {r["kind"]: r for r in main}
    assert by_kind["reply"]["post_id"] == -1  # unresolved sentinel
    assert by_kind["reply"]["parent_id"] == 2
    assert by_kind["comment"]["post_id"] == 1
    assert by_kind["post"]["tags"] == [1, 2]
    assert by_kind["like"]["person_id"] == 13
    assert outs["tombstones"].collect()[0]["partition_id"] == 0
    assert outs["errors"].count() == 2  # bad tag + bad date
    late = outs["late"].collect()
    assert [r["kind"] for r in late] == ["post", "comment"] or len(late) == 2


def test_read_pipe_csv_roundtrip(spark, sf_dir, tmp_path):
    """S5: pipe-CSV write → read round trip, extra columns droppable."""
    from eth_dspa_2019_spark.io.readers import read_pipe_csv

    df = spark.createDataFrame(
        [(1, 10, 2001), (2, 20, 2002)],
        "person_id long, object_id long, classYear long",
    )
    p = str(tmp_path / "person_studyAt_organisation")
    write_single_csv(df.selectExpr(
        "person_id as `Person.id`", "object_id as `Organisation.id`",
        "classYear",
    ), p)
    back = read_pipe_csv(
        spark, p, keep_columns=["`Person.id`", "`Organisation.id`"]
    )
    assert back.columns == ["Person.id", "Organisation.id"]
    assert back.count() == 2


def test_repartition_and_broadcast_plan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # P5/P6: rebalance / random repartition
    assert ev.repartition(7).rdd.getNumPartitions() == 7
    # P10: exchange by key hash
    assert ev.repartition(5, "user_id").rdd.getNumPartitions() == 5
    # P7: broadcast replication — the plan must use a broadcast join
    small = ev.groupBy("event_type").count()
    plan = ev.join(
        F.broadcast(small), "event_type"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_paced_replay_schedule_and_stream_equivalence(spark, sf_dir, tmp_path):
    """speedupFactor pacing (S3): chunks are scheduled at
    (event_offset / speedup) wall seconds — asserted via an injected clock,
    no real sleeping — and the paced directory, consumed as a file stream,
    yields the same windowed counts as the batch query."""
    from eth_dspa_2019_spark.harness import paced_replay
    from eth_dspa_2019_spark.streaming import run_to_memory

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    lines = ev.select(
        F.concat_ws("|", F.col("event_id"), F.col("user_id")).alias("value"),
        "ts",
    )

    sleeps: list[float] = []
    fake_now = [0.0]

    def clock() -> float:
        return fake_now[0]

    def sleep(s: float) -> None:
        sleeps.append(s)
        fake_now[0] += s

    speedup = 604800.0  # the reference's recommended replay acceleration
    out = str(tmp_path / "paced")
    emitted = paced_replay(
        lines, out, speedup, chunk_event_seconds=6 * 3600, sleep=sleep, clock=clock
    )
    # schedule: chunk i lands at i*chunk_seconds/speedup on the fake clock
    assert len(emitted) > 2
    for path, scheduled in emitted:
        assert abs(scheduled - int(path[-6:]) * 6 * 3600 / speedup) < 1e-9
    assert sleeps and abs(sum(sleeps) - emitted[-1][1]) < 1e-6

    # the paced directory is a valid bounded replay: same windowed counts
    parsed = (
        spark.readStream.format("text")
        .load(f"{out}/chunk*")
        .select(
            F.element_at(F.split("value", r"\|"), 1).cast("long").alias("event_id")
        )
    )
    got = run_to_memory(
        parsed.groupBy().agg(F.count(F.lit(1)).alias("n")),
        str(tmp_path / "ck"),
        "complete",
    )
    assert got.collect()[0]["n"] == n_events


def test_sql_front_door_matches_dataframe_plan(spark, sf_dir):
    """spark.sql over registered views must equal the DataFrame query and
    compile to the same pushdown-capable scan."""
    from eth_dspa_2019_spark.io.readers import register_views
    from eth_dspa_2019_spark.plans import all_queries

    register_views(spark, sf_dir)
    sql_df = spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in sql_df.collect()
    }
    expected = {
        (r["l_returnflag"], r["l_linestatus"]): r["count_order"]
        for r in all_queries()["q1_pricing_summary"].spark(spark, sf_dir).collect()
    }
    assert got == expected
    plan = sql_df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan  # views stay pushdown-capable scans
