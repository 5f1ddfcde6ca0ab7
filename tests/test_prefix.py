"""The two-stage range-prefix plans (`operators/prefix.py`) must be
bit-identical to the single-partition global window they replace, while
actually spreading the work over many partitions."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eth_dspa_2019_spark.io.readers import load_table
from eth_dspa_2019_spark.operators.prefix import (
    global_index,
    global_running_max,
    global_running_sums,
)


def test_global_index_matches_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    got = {
        r["event_id"]: r["rn"]
        for r in global_index(ev, ["ts", "event_id"], num_partitions=7).collect()
    }
    w = Window.orderBy("ts", "event_id")
    want = {
        r["event_id"]: r["rn"]
        for r in ev.select("event_id", F.row_number().over(w).alias("rn")).collect()
    }
    assert got == want


def test_global_running_sums_match_window_with_null_runs(spark, sf_dir):
    # value sums restricted to one event_type -> long null prefixes/suffixes
    # inside partitions, exercising the offset null-bookkeeping.
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    expr = F.when(F.col("event_type") == "purchase", F.floor(F.col("value") * 1000))
    got_df = global_running_sums(
        ev, ["ts", "event_id"], {"rsum": expr, "rcnt": F.when(expr.isNotNull(), F.lit(1))},
        num_partitions=7,
    )
    got = {r["event_id"]: (r["rsum"], r["rcnt"]) for r in got_df.collect()}

    w = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want_df = ev.select(
        "event_id",
        F.sum(expr).over(w).alias("rsum"),
        F.sum(F.when(expr.isNotNull(), F.lit(1))).over(w).alias("rcnt"),
    )
    want = {r["event_id"]: (r["rsum"], r["rcnt"]) for r in want_df.collect()}
    assert got == want


def test_global_running_max_exclusive_matches_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id")
    e = F.col("event_id")
    expr = F.when(e % 10 <= 2, e)  # sparse: long null runs
    got_df = global_running_max(
        ev, ["event_id"], {"last": expr}, exclusive=True, num_partitions=7
    )
    got = {r["event_id"]: r["last"] for r in got_df.collect()}
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    want_df = ev.select("event_id", F.max(expr).over(w).alias("last"))
    want = {r["event_id"]: r["last"] for r in want_df.collect()}
    assert got == want


def test_prefix_plan_has_no_single_partition_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    ranked = global_index(ev, ["ts", "event_id"], num_partitions=7)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # the only Window in the plan is keyed by the stamped partition id ...
    assert "windowspecdefinition(__pfx_pid" in plan
    # ... and nothing funnels through one reducer (an unkeyed window would
    # show an `Exchange SinglePartition`; AQE may still *coalesce* the tiny
    # test shuffle, which is fine — the plan shape is what must scale)
    assert "SinglePartition" not in plan
