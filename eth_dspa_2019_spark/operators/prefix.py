"""Exact global prefix aggregation without a single-partition window.

``Window.orderBy(...)`` with no partition key forces every row through one
reducer — correct, but the one plan shape that cannot survive a 100 TB
input. The classic scalable replacement (the same trick RDD
``zipWithIndex`` uses internally) is a two-stage plan:

1. range-partition the rows by the global order key (so partition *i*
   holds a contiguous key range, and all of partition *i*'s keys precede
   partition *i+1*'s);
2. one tiny metadata job: per-partition totals (#partitions rows — KB of
   driver data even at 100 TB), prefix-summed on the driver into
   per-partition *exclusive offsets*;
3. the main pass: an ordinary ``Window.partitionBy(partition_id)``
   running aggregate — fully parallel — plus the broadcast offset.

The result is bit-identical to the single-partition window (integer /
fixed-point sums are associative), but the widest window any reducer
sees is one range partition. The driver-side ``.collect()`` in step 2 is
partition-count-sized metadata, not data — the pattern stays distributed.

Used by the Task 3 global running means (`operators/anomaly.py`, the
reference's broadcast-signatures state, `SN/task/anomalydetection/
AnomalousUserDetector.java:160-200`) and the global-rank queries
(`plans/misc.py`).

Requires non-null order columns (all call sites order by non-null keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__pfx_pid"


def _range_partitioned(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Range-partition by the order key and stamp the partition id.

    Persisted: the offsets job and the main pass must see the same
    physical partitioning (range boundaries come from sampling). Pass a
    ``cache_registry`` list to receive the persisted frame so long-lived
    callers (per-micro-batch folds) can unpersist after materializing —
    otherwise one persisted RDD leaks per call until clear_plan_caches."""
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    part = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    out = part.withColumn(_PID, F.spark_partition_id()).persist()
    if cache_registry is not None:
        cache_registry.append(out)
    return out


def _pid_map(pairs: dict[int, int | float]) -> Column:
    """Literal pid→value map (partition-count entries, pure projection —
    no join stage)."""
    if not pairs:
        return F.create_map()
    flat: list[Column] = []
    for k, v in pairs.items():
        flat.append(F.lit(k))
        flat.append(F.lit(v))
    return F.create_map(*flat)


def global_index(
    df: DataFrame,
    order_cols: list[str],
    *,
    index_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``row_number() OVER (ORDER BY order_cols)`` — 1-based dense global
    rank over a total order — as the two-stage range plan.

    ``order_cols`` must be a total order (no ties) for the rank to be
    deterministic, exactly as with the window form.
    """
    part = _range_partitioned(df, order_cols, num_partitions)
    counts = {
        r[_PID]: r["n"]
        for r in part.groupBy(_PID).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return part.withColumn(
        index_col,
        F.row_number().over(w) + F.coalesce(_pid_map(offsets)[F.col(_PID)], F.lit(0)),
    ).drop(_PID)


def global_running_max(
    df: DataFrame,
    order_cols: list[str],
    exprs: dict[str, Column],
    *,
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """For each ``name -> expr``, add column ``name`` holding
    ``max(expr) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING
    [AND 1 PRECEDING if exclusive])`` via the two-stage range plan —
    max is associative, so a per-partition running max plus the max of
    all earlier partitions' totals is exact."""
    tmp = {name: f"__pfx_{name}" for name in exprs}
    base = df.select("*", *[c.alias(tmp[n]) for n, c in exprs.items()])
    part = _range_partitioned(base, order_cols, num_partitions)

    partials = {
        r[_PID]: r.asDict()
        for r in part.groupBy(_PID)
        .agg(*[F.max(tmp[n]).alias(f"m_{n}") for n in exprs])
        .collect()
    }
    end = -1 if exclusive else Window.currentRow
    w = Window.partitionBy(_PID).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, end
    )
    types = dict(part.dtypes)
    out = part
    for name in exprs:
        prior: dict[int, object] = {}
        acc = None
        for pid in sorted(partials):
            if acc is not None:
                prior[pid] = acc
            m = partials[pid][f"m_{name}"]
            if m is not None:
                acc = m if acc is None else max(acc, m)
        win = F.max(tmp[name]).over(w)
        off = _pid_map(prior)[F.col(_PID)].cast(types[tmp[name]]) if prior else F.lit(
            None
        ).cast(types[tmp[name]])
        out = out.withColumn(name, F.greatest(win, off))
    return out.drop(_PID, *tmp.values())


def global_running_sums(
    df: DataFrame,
    order_cols: list[str],
    exprs: dict[str, Column],
    *,
    num_partitions: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """For each ``name -> expr``, add column ``name`` holding
    ``sum(expr) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)`` —
    inclusive of the current row — via the two-stage range plan.

    Null expr values are skipped (SQL sum semantics), and a running sum
    with no contributions yet is null, exactly matching the window form:
    the metadata job collects per-partition (sum, non-null count) so the
    offset can distinguish "no prior contributions" from "prior sum 0".

    Sums should be integer / fixed-point for cross-engine bit-equality
    (floating-point addition is not associative; see
    `functions/hashing.py` module notes).
    """
    tmp = {name: f"__pfx_{name}" for name in exprs}
    base = df.select("*", *[c.alias(tmp[n]) for n, c in exprs.items()])
    part = _range_partitioned(base, order_cols, num_partitions, cache_registry)

    aggs = []
    for name in exprs:
        aggs.append(F.sum(tmp[name]).alias(f"s_{name}"))
        aggs.append(F.count(tmp[name]).alias(f"c_{name}"))
    partials = {r[_PID]: r.asDict() for r in part.groupBy(_PID).agg(*aggs).collect()}

    # r11: the per-name offset projection is ONE selectExpr of SQL
    # strings. The Column form paid ~130 py4j round-trips per name
    # (two 2·|partitions|-literal create_maps, window spec, when chain),
    # multiplied by withColumn's plan copy — at 10 names over 32
    # partitions that was the bulk of task3's 11.7k-round-trip build.
    # Same expressions, same physical plan, bit-identical offsets.
    def _sql_map(pairs: dict[int, int]) -> str:
        if not pairs:
            return "map()"
        entries = ", ".join(
            f"{k}, CAST({v} AS BIGINT)" for k, v in pairs.items()
        )
        return f"map({entries})"

    order_sql = ", ".join(f"`{c}`" for c in order_cols)
    win_frame = (
        f"OVER (PARTITION BY `{_PID}` ORDER BY {order_sql} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    name_exprs = []
    for name in exprs:
        prior_sum: dict[int, int] = {}
        prior_cnt: dict[int, int] = {}
        acc_s, acc_c = 0, 0
        for pid in sorted(partials):
            prior_sum[pid], prior_cnt[pid] = acc_s, acc_c
            acc_s += partials[pid][f"s_{name}"] or 0
            acc_c += partials[pid][f"c_{name}"]
        win = f"sum(`{tmp[name]}`) {win_frame}"
        off_s = f"coalesce({_sql_map(prior_sum)}[`{_PID}`], 0)"
        off_c = f"coalesce({_sql_map(prior_cnt)}[`{_PID}`], 0)"
        name_exprs.append(
            f"CASE WHEN ({win}) IS NOT NULL OR {off_c} > 0 "
            f"THEN coalesce({win}, 0) + {off_s} END AS `{name}`"
        )
    out = part.selectExpr("*", *name_exprs)
    return out.drop(_PID, *tmp.values())
