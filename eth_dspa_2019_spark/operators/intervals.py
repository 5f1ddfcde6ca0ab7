"""Interval analytics: merge (gaps-and-islands) and range join.

Two operators the reference lacks and a large-scale analytics engine
needs (SURVEY §2.4 bonus family, next to as-of join):

- :func:`merge_intervals` — coalesce overlapping/touching half-open
  ``[s, e)`` intervals into disjoint islands. The classic formulation is
  a running max of ``e`` over the global ``(s, e)`` order plus a
  cumulative new-island flag — both run on the two-stage range-prefix
  plan (`operators/prefix.py`), so there is no single-partition window
  even though the order is global.
- :func:`interval_join` — join fact rows with ``ts ∈ [s, e)`` intervals.
  A naive ``ts >= s AND ts < e`` join has no equi-key, which Spark
  executes as a broadcast-nested-loop / cartesian product. The scale
  shape is bucketization: explode each interval to the coarse time
  buckets it covers, equi-join on the bucket, then apply the residual
  range predicate — O(rows + intervals·len/width) instead of
  O(rows·intervals). Pick ``bucket_width`` near the median interval
  length so most intervals explode to ≤2 bucket rows.

Interval columns are epoch-seconds BIGINTs (`functions/time.py`), and
intervals must be non-empty (``e > s``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .prefix import global_running_max, global_running_sums


def merge_intervals(
    df: DataFrame, start_col: str = "s", end_col: str = "e"
) -> DataFrame:
    """Merged disjoint islands ``(window_start, window_end, n_src)`` from
    half-open intervals (touching intervals — ``s == prev_end`` — merge).

    Per-row island ids in a tie group ``(s, e)`` are assignment-order
    dependent, but the grouped output (min start, max end, count) is
    invariant — the only thing returned.
    """
    iv = df.select(F.col(start_col).alias("s"), F.col(end_col).alias("e"))
    order = ["s", "e"]
    prev = global_running_max(iv, order, {"prev_max": F.col("e")}, exclusive=True)
    flag = prev.withColumn(
        "new_island",
        F.when(
            F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1
        ).otherwise(0),
    )
    isl = global_running_sums(flag, order, {"island": F.col("new_island")})
    return isl.groupBy("island").agg(
        F.min("s").alias("window_start"),
        F.max("e").alias("window_end"),
        F.count(F.lit(1)).alias("n_src"),
    ).drop("island")


def interval_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str = "window_start",
    end_col: str = "window_end",
    bucket_width: int = 900,
) -> DataFrame:
    """Rows of ``left`` joined to every interval containing their
    ``ts_col`` (half-open), via bucketized equi-join — never a
    nested-loop product. Column names must not collide across inputs."""
    w = F.lit(int(bucket_width))
    b_iv = intervals.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w).cast("long"),
                F.floor((F.col(end_col) - 1) / w).cast("long"),
            )
        ),
    )
    b_left = left.withColumn("__lb", F.floor(F.col(ts_col) / w).cast("long"))
    return (
        b_left.join(
            b_iv,
            (F.col("__lb") == F.col("__rb"))
            & (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col)),
        )
        .drop("__lb", "__rb")
    )
