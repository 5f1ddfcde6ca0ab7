"""Event-time windowed queries over the ``events`` table — the batch
expression of the reference's streaming window operators (SURVEY.md §2.4-2.5).

Streaming variants of the same operators live in
:mod:`eth_dspa_2019_spark.streaming`; these batch forms are the oracle-checked
semantics (the reference itself validates streaming against single-threaded
batch evaluators, `SN/validation/SlidingWindowEvaluator.java:35-59`).

Window starts are emitted as epoch-second BIGINTs: Spark's ``window()`` is
epoch-aligned (UTC), so ``cast(window.start as long)`` equals DuckDB's
``floor(epoch(ts)/slide)*slide`` arithmetic exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import osum
from ..functions.time import epoch_seconds
from ..io.readers import load_table
from .registry import register


@register(
    "tumbling_counts_30m",
    oracle="""
    SELECT cast(floor(epoch(ts)/1800)*1800 as bigint) AS window_start,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def tumbling_counts_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/A1: 30-min tumbling count per key
    (`SN/task/activepost/ActivePostStatistician.java:49-51,104-142`)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "sliding_counts_12h_30m",
    oracle="""
    SELECT cast(floor(epoch(ts)/1800)*1800 - i*1800 as bigint) AS window_start,
           event_type,
           count(*) AS n_events
    FROM events, range(0, 24) t(i)
    GROUP BY 1, 2
    """,
)
def sliding_counts_12h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/A2: 12h sliding / 30m slide counts, computed as the reference's
    two-stage decomposition — 30-min tumbling partials re-aggregated into
    sliding windows (`SN/task/activepost/ActivePostStatistician.java:56-78`,
    SURVEY §4.1). At scale this shrinks the sliding-window shuffle by the
    pre-aggregation factor instead of replicating every row 24×.
    """
    ev = load_table(spark, sf_dir, "events")
    partial = ev.groupBy(
        F.window("ts", "30 minutes").alias("w30"), "event_type"
    ).agg(F.count(F.lit(1)).alias("partial_n"))
    return (
        partial.groupBy(
            F.window(F.col("w30.start"), "12 hours", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(F.sum("partial_n").alias("n_events"))
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
        )
    )


@register(
    "unique_users_12h_1h",
    oracle="""
    SELECT cast(floor(epoch(ts)/3600)*3600 - i*3600 as bigint) AS window_start,
           count(DISTINCT user_id) AS n_users
    FROM events, range(0, 12) t(i)
    GROUP BY 1
    """,
)
def unique_users_12h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/A3/A4: unique users per 12h/1h sliding window
    (`SN/task/activepost/ActivePostStatistician.java:92-96,224-271`).

    Exact distinct (the reference's Set-union semantics). Scale paths live
    in plans/misc.py: `unique_users_two_stage` (exact — dedupes
    (hour, user) before the 12× window replication) and
    `unique_users_approx` (HLL sketches, associatively merged).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "12 hours", "1 hour").alias("w"))
        .agg(F.countDistinct("user_id").alias("n_users"))
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "n_users",
        )
    )


@register(
    "session_windows_30m_gap",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           cast(floor(epoch(min(ts))) as bigint) AS session_start,
           cast(floor(epoch(max(ts))) + 1800 as bigint) AS session_end,
           count(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_windows_30m_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: session windows with 30-min gap timeout — the session-5 custom
    Timely operator (`session-5-custom-operators/session/src/bin/mine.rs:17-92`)
    as Spark's built-in ``session_window``. Session end = last event + gap,
    matching the timeout-based close semantics of the reference op.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            epoch_seconds(F.col("sw.start")).alias("session_start"),
            epoch_seconds(F.col("sw.end")).alias("session_end"),
            "n_events",
        )
    )


@register(
    "running_user_totals",
    oracle=f"""
    SELECT event_id, user_id,
           cast(sum(cast(value as decimal(38,6)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) as double) AS running_value
    FROM events
    """,
)
def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: keyed running reduce, emitted per record — the session-1 running
    byte-diff sum (`session-1-flink/.../WikipediaAnalysis.java:79-86`).
    Batch form: running-frame window sum; streaming form: ``groupBy.sum`` in
    update mode (see streaming module).
    """
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


@register(
    "windowed_value_stats",
    oracle=f"""
    SELECT cast(floor(epoch(ts)/3600)*3600 as bigint) AS window_start,
           event_type,
           {osum('value')} AS sum_value,
           count(*) AS n_events,
           max(value) AS max_value,
           min(value) AS min_value
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY 1, 2
    """,
)
def windowed_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A11 analog: keyed tumbling multi-aggregate with a pushed filter
    (`session-1-flink/.../WikipediaAnalysisWindowed.java:78-87`)."""
    from ..functions.numeric import dsum

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            dsum("value").alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
            F.max("value").alias("max_value"),
            F.min("value").alias("min_value"),
        )
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "event_type",
            "sum_value",
            "n_events",
            "max_value",
            "min_value",
        )
    )
