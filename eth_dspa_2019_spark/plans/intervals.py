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
