"""Registered interval-analytics queries: merged error windows
(gaps-and-islands) and the purchases-in-error-windows range join —
`operators/intervals.py` exercised over the events table.

Error "incident windows" are [error_ts, error_ts + 15 min) half-open
intervals; overlapping/touching windows coalesce into islands, then
purchase events land in their covering island via the bucketized
interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.time import epoch_seconds
from ..io.readers import load_table
from ..operators.intervals import interval_join, merge_intervals
from .registry import register

ERR_WINDOW_S = 900  # 15 min incident window per error event

_O_MERGED = f"""
    iv AS (SELECT cast(floor(epoch(ts)) AS bigint) AS s,
                  cast(floor(epoch(ts)) AS bigint) + {ERR_WINDOW_S} AS e
           FROM events WHERE event_type = 'error'),
    ord AS (SELECT s, e,
                   max(e) OVER (ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_max
            FROM iv),
    isl AS (SELECT s, e,
                   sum(CASE WHEN prev_max IS NULL OR s > prev_max
                            THEN 1 ELSE 0 END)
                     OVER (ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
            FROM ord),
    merged AS (SELECT min(s) AS window_start, max(e) AS window_end,
                      count(*) AS n_src
               FROM isl GROUP BY island)
"""


def _error_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = epoch_seconds("ts")
    return ev.filter(F.col("event_type") == "error").select(
        s.alias("s"), (s + ERR_WINDOW_S).alias("e")
    )


@register(
    "error_windows_merged",
    oracle=f"""
    WITH {_O_MERGED}
    SELECT window_start, window_end, n_src FROM merged
    """,
)
def error_windows_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge: per-error 15-min incident windows
    coalesced into disjoint islands (running max + cumulative island flag
    on the two-stage range-prefix plan — no single-partition window)."""
    return merge_intervals(_error_intervals(spark, sf_dir))


@register(
    "purchases_in_error_windows",
    oracle=f"""
    WITH {_O_MERGED}
    SELECT m.window_start, m.window_end, count(*) AS n_purchases
    FROM merged m
    JOIN events p
      ON p.event_type = 'purchase'
     AND cast(floor(epoch(p.ts)) AS bigint) >= m.window_start
     AND cast(floor(epoch(p.ts)) AS bigint) < m.window_end
    GROUP BY 1, 2
    """,
)
def purchases_in_error_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: purchases falling inside any merged error window,
    counted per window — bucketized equi-join on the coarse time bucket
    plus the residual range predicate (never a nested-loop product; the
    oracle's plain range join is the semantics, not the plan)."""
    merged = merge_intervals(_error_intervals(spark, sf_dir)).drop("n_src")
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(epoch_seconds("ts").alias("p_ts"))
    )
    joined = interval_join(
        purchases, merged, "p_ts", bucket_width=ERR_WINDOW_S
    )
    return joined.groupBy("window_start", "window_end").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )


GAPFILL_USERS = 50  # dashboard cohort: user_id < 50
HOUR = 3600


@register(
    "events_gapfill_1h",
    oracle=f"""
    WITH obs AS (
      SELECT user_id,
             cast(floor(epoch(ts) / {HOUR}) * {HOUR} AS bigint) AS h,
             value,
             row_number() OVER (PARTITION BY user_id,
                                    cast(floor(epoch(ts) / {HOUR}) * {HOUR}
                                         AS bigint)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE user_id < {GAPFILL_USERS}
    ),
    hourly AS (SELECT user_id, h, value FROM obs WHERE rn = 1),
    spans AS (SELECT user_id, min(h) AS h0, max(h) AS h1
              FROM hourly GROUP BY user_id),
    grid AS (
      SELECT s.user_id, cast(g.h AS bigint) AS hour_start
      FROM spans s, unnest(range(s.h0, s.h1 + 1, {HOUR})) g(h)
    )
    SELECT g.user_id, g.hour_start,
           last_value(o.value IGNORE NULLS)
             OVER (PARTITION BY g.user_id ORDER BY g.hour_start
                   ROWS UNBOUNDED PRECEDING) AS value_ff,
           o.value IS NULL AS is_gap
    FROM grid g LEFT JOIN hourly o
      ON o.user_id = g.user_id AND o.h = g.hour_start
    """,
)
def events_gapfill_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill (the hypertable ``time_bucket_gapfill``
    / ``locf`` pattern): each cohort user's value series is bucketed to
    hours (last observation per bucket, deterministic tie-break), a dense
    hour grid is generated per user from their own observed span, and
    missing buckets forward-fill from the last observation
    (``last(..., ignorenulls=True)`` over an ever-growing frame).

    Scale shape: bucketing + last-per-bucket are one windowed pass
    partitioned by (user, hour); the grid explode is bounded by
    span/granularity per key (never a global calendar cross join); the
    forward-fill window is per-user ordered — one exchange on user_id.
    At 100 TB the cohort predicate pushes to the scan, so the job reads
    only the keys being rendered."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < GAPFILL_USERS
    )
    from pyspark.sql.window import Window

    h = (F.floor(F.col("ts").cast("long") / HOUR) * HOUR).alias("h")
    w_last = Window.partitionBy("user_id", "h").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    hourly = (
        ev.select("user_id", h, "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("user_id", "h", "value")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.lit(HOUR))
        ).alias("hour_start"),
    )
    w_ff = (
        Window.partitionBy("user_id")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(
            hourly,
            (grid.user_id == hourly.user_id)
            & (grid.hour_start == hourly.h),
            "left",
        )
        .select(
            grid.user_id,
            "hour_start",
            F.col("value").alias("v"),
        )
        .select(
            "user_id",
            "hour_start",
            F.last("v", ignorenulls=True).over(w_ff).alias("value_ff"),
            F.col("v").isNull().alias("is_gap"),
        )
    )
