"""Bucketed tables must make the repeat-join shuffle disappear: the
ingest-time ``bucketBy`` shuffle is paid once, then an equi-join between
same-spec tables runs with NO Exchange on either side."""

from __future__ import annotations

import pyspark.sql.functions as F

from eth_dspa_2019_spark.io.bucketed import colocated_join, write_bucketed
from eth_dspa_2019_spark.io.readers import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "bk_orders", str(tmp_path / "bk_orders"), "o_orderkey", 8
    )
    write_bucketed(
        lineitem,
        "bk_lineitem",
        str(tmp_path / "bk_lineitem"),
        "l_orderkey",
        8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the exchange question is non-trivial
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(
            spark, "bk_orders", "bk_lineitem", "o_orderkey", "l_orderkey"
        )
        agg = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("sq"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located buckets, no shuffle
        # and the result is the same as the plain (shuffled) join
        got = agg.collect()[0]
        plain = (
            orders.join(
                lineitem, orders.o_orderkey == lineitem.l_orderkey
            )
            .agg(
                F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("sq")
            )
            .collect()[0]
        )
        assert (got.n, got.sq) == (plain.n, plain.sq)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_orders")
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")


def test_bucketed_scan_prunes_buckets(spark, sf_dir, tmp_path):
    """A point predicate on the bucket key must read one bucket, not all 8
    — SelectedBucketsCount surfaces the pruning in the plan."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(
        orders, "bk_orders_p", str(tmp_path / "bk_orders_p"), "o_orderkey", 8
    )
    try:
        # a bare filter doesn't need the bucketed distribution, so the
        # planner drops the bucketed scan unless auto-bucketed-scan is off
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
        )
        df = spark.table("bk_orders_p").filter(F.col("o_orderkey") == 7)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SelectedBucketsCount: 1 out of 8" in plan
        df.collect()
    finally:
        spark.conf.unset(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled"
        )
        spark.sql("DROP TABLE IF EXISTS bk_orders_p")


def test_incremental_dedup_probe_against_bucketed_state(spark, sf_dir, tmp_path):
    """The incremental-dedup story at rest: corpus band rows persisted as
    a table bucketed by the join key mean a new batch's probe shuffles
    ONLY the delta side — the standing state is read co-located."""
    import pyspark.sql.functions as F

    from eth_dspa_2019_spark.operators.dedup import (
        _band_rows,
        minhash_signatures,
        shingles,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    newb = docs.filter(F.col("doc_id") % 2 == 1)

    def bkeyed(side):
        rows = _band_rows(
            minhash_signatures(shingles(side, "doc_id", "text", 3), 16),
            16,
            8,
        )
        # single composite join key so the bucket spec == the join spec
        return rows.select(
            "id",
            F.concat_ws(":", F.col("band_id"), F.col("band_key")).alias(
                "bkey"
            ),
        )

    write_bucketed(
        bkeyed(corpus), "bk_bands", str(tmp_path / "bk_bands"), "bkey", 8
    )
    bn = bkeyed(newb)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        state = spark.table("bk_bands")
        cand = (
            bn.alias("n")
            .join(state.alias("c"), F.col("n.bkey") == F.col("c.bkey"))
            .select(F.col("n.id").alias("a"), F.col("c.id").alias("b"))
        )
        cand.count()
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # the standing state is read through its buckets ...
        assert "Bucketed: true" in plan
        # ... so the only exchanges are the DELTA pipeline's: its signature
        # aggregation and its shuffle into the state's bucket layout
        assert plan.count("Exchange hashpartitioning") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_bands")
