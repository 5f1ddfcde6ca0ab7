"""Relational core queries over the TPC-H-ish driver testdata.

These exercise the engine spine — scan → filter → project → join → aggregate
→ sort/limit — the batch substrate every reference task sits on
(SURVEY.md §2.2-2.4, §2.6-2.7). Join strategy is left to Catalyst: dims
(region/nation/customer/supplier/part) broadcast under the configured
threshold; fact-fact joins are sort-merge with AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum, oavg, osum
from ..functions.time import epoch_seconds
from ..io.readers import load_table
from .registry import register


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {osum('l_quantity')} AS sum_qty,
           {osum('l_extendedprice')} AS sum_base_price,
           {osum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {oavg('l_quantity')} AS avg_qty,
           {oavg('l_discount')} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: filter → grouped multi-aggregate.

    The streaming analog is the reference's partial+final AggregateFunction
    pattern (`SN/task/activepost/ActivePostStatistician.java:104-142`) —
    Spark plans the same partial→final split automatically
    (HashAggregateExec pair, SURVEY.md §4.1).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT o.o_orderkey,
           {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           cast(floor(epoch(o.o_orderdate)) as bigint) AS orderdate_epoch,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: selective 3-way join → agg → top-10.

    customer is the small side (broadcast); lineitem⋈orders shuffles on
    orderkey. Tie-break on o_orderkey so LIMIT is deterministic across
    engines.
    """
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .select(
            "o_orderkey",
            "revenue",
            epoch_seconds("o_orderdate").alias("orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join: dims broadcast, facts shuffle on keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {osum('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style: pure filter+global agg — the predicate-pushdown probe.

    ``.explain`` must show these filters in PushedFilters and a 4-column
    ReadSchema; if not, the scan is wrong (SURVEY.md §4.2).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "top3_customers_per_nation",
    oracle="""
    SELECT n_name, c_custkey, c_acctbal, rnk
    FROM (
      SELECT n.n_name, c.c_custkey, c.c_acctbal,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rnk <= 3
    """,
)
def top3_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the Task 2 top-5 pattern
    (`SN/task/recommendation/FriendRecommender.java:394-400`, SURVEY §2.6 T1).
    """
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@register(
    "customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference as anti-join — the reference's friend-exclusion /
    leaf-id patterns (SURVEY §2.3 J2, §2.7 U2). Anti-join beats EXCEPT at
    scale: no distinct shuffle of the big side's full width, and the
    filter on the excluded side is pushed below the join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # c_custkey is already unique — no distinct needed after the anti-join
    # (the oracle's EXCEPT dedups; the Spark side would only add a shuffle).
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style semi-join (EXISTS) — left_semi in Spark."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q4_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS semi-join: orders in a one-year range with at
    least one returned lineitem, counted per priority. The semi-join
    matters at scale: the fact side is never widened — Spark's left_semi
    probes and drops, shipping only the orders columns, and the date
    filter pushes to the orders scan (plan-asserted)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    in_range = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        in_range.join(
            returned,
            in_range.o_orderkey == returned.l_orderkey,
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q10_returned_revenue_topk",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-shaped lost-revenue report: top-20 customers by revenue
    from returned items in a half-year window. Scale shape: the returnflag
    + date filters push to both fact scans, nation broadcasts, the
    orders⋈lineitem fact join shuffles on orderkey (AQE skew-safe), and
    the global top-20 is a TakeOrdered (per-partition heap + driver merge
    of 20-row partials), never a full sort. Ties broken by c_custkey so
    the cut is deterministic cross-engine (revenue doubles are
    bit-identical via the decimal-sum discipline)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    in_range = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R")
    return (
        returned.join(
            in_range, returned.l_orderkey == in_range.o_orderkey
        )
        .join(cust, in_range.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "referential_audit",
    oracle="""
    SELECT
      (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
        AS orphan_lineitems,
      (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
        AS orphan_orders,
      (SELECT count(*) FROM (SELECT event_id FROM events
                             GROUP BY event_id HAVING count(*) > 1))
        AS dup_event_ids,
      (SELECT count(*) FROM documents WHERE text IS NULL OR text = '')
        AS empty_docs,
      (SELECT count(*) FROM events WHERE value IS NULL OR isnan(value))
        AS bad_event_values
    """,
)
def referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit (the deequ-style constraint suite every ingest
    runs before analytics): foreign-key orphans via anti-joins, duplicate
    primary keys via a grouped HAVING, null/NaN value rates — one row of
    violation counts, all expected 0 on healthy data.

    Scale shape: each FK check is ONE anti-join on the key (semi-join
    probe, fact side never widened); the dup check is a map-side-combined
    groupBy; the null scans are map-only. The audits are independent
    DataFrame branches unioned via scalar aggregation, so Spark runs them
    as parallel stages of one job."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def cnt(df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n"))

    orphan_li = cnt(
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
    ).select(F.col("n").alias("orphan_lineitems"))
    orphan_o = cnt(
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
    ).select(F.col("n").alias("orphan_orders"))
    dups = cnt(
        ev.groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
    ).select(F.col("n").alias("dup_event_ids"))
    empty = cnt(
        docs.filter(F.col("text").isNull() | (F.col("text") == ""))
    ).select(F.col("n").alias("empty_docs"))
    badv = cnt(
        ev.filter(F.col("value").isNull() | F.isnan("value"))
    ).select(F.col("n").alias("bad_event_values"))
    return (
        orphan_li.crossJoin(orphan_o)
        .crossJoin(dups)
        .crossJoin(empty)
        .crossJoin(badv)
    )


@register(
    "q22_idle_high_balance",
    oracle=f"""
    SELECT n.n_name,
           count(*) AS n_custs,
           {osum('c.c_acctbal')} AS total_bal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > (SELECT {oavg('c_acctbal')} FROM customer
                         WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY n.n_name
    """,
)
def q22_idle_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped sales-opportunity report: customers whose balance
    beats the global positive-balance average but who placed no recent
    orders, counted per nation. Exercises the scalar subquery (one global
    aggregate broadcast as a literal into the filter) + NOT EXISTS
    anti-join surface.

    Scale shape: the scalar average is a one-row aggregate Spark plans as
    a subquery broadcast (no join); the recency check is an anti-join on
    custkey probing only the date-filtered orders (filter pushed to that
    scan); nation broadcasts. The customer scan is read once."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
    )


@register(
    "q7_cross_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           cast(year(l.l_shipdate) AS bigint) AS ship_year,
           {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q7_cross_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style bilateral trade volume: the same dimension table
    joined TWICE under different roles (supplier nation vs customer
    nation), with a disjunctive cross-role predicate.

    Scale shape: both nation copies broadcast (a dim joined twice costs
    two broadcasts, never a shuffle); the pair predicate is applied after
    the broadcasts so the fact tables shuffle only on their join keys.
    The nation-name filter cannot be pushed into either single-role scan
    (it spans both roles), but the dims are tiny by construction."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT cast(month(l.l_shipdate) AS bigint) AS ship_month,
           {osum("CASE WHEN p.p_type = 'PROMO' "
                 "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
             AS promo_revenue,
           {osum('l.l_extendedprice * (1 - l.l_discount)')} AS total_revenue,
           100.0 * {osum("CASE WHEN p.p_type = 'PROMO' "
                         "THEN l.l_extendedprice * (1 - l.l_discount) "
                         "ELSE 0 END")}
                 / {osum('l.l_extendedprice * (1 - l.l_discount)')}
             AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promotion-effect report, widened to one row per 1996
    ship month: the conditional-aggregate-over-join shape (the reference's
    per-type conditional counts, `SN/task/activepost/
    ActivePostStatistician.java:92-96`, applied to a ratio metric).

    Scale shape: part broadcasts under the threshold; the date filter is
    pushed to the lineitem scan; promo and total revenue come out of ONE
    grouped aggregate (two conditional sums, no second pass); the ratio is
    a per-row projection over the 12-row aggregate. Decimal-exact sums
    make the shares bit-identical across engines and partitionings."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    out = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").cast("bigint").alias("ship_month"))
        .agg(
            dsum(promo).alias("promo_revenue"),
            dsum(rev).alias("total_revenue"),
        )
    )
    return out.select(
        "ship_month",
        "promo_revenue",
        "total_revenue",
        (100.0 * F.col("promo_revenue") / F.col("total_revenue")).alias(
            "promo_share_pct"
        ),
    )


@register(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#2'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 3)
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style supplier-variety report: how many distinct
    suppliers ship each (brand, type, size) bucket, excluding a blacklist
    (here: negative-balance suppliers) — distinct-count over a join with a
    NOT-IN exclusion.

    Scale shape: the part predicate (brand/size) broadcasts with the dim
    and prunes the fact rows before the aggregate; the blacklist is a
    broadcast anti-join (never a shuffled NOT IN); count(DISTINCT) plans
    as the two-level Expand-free distinct aggregate on the already-grouped
    keys, shuffled once on (brand, type, size)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#2")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 3)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q18_large_volume_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY 1
      HAVING sum(cast(l_quantity AS decimal(38,6))) > 250
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           cast(floor(epoch(o.o_orderdate)) AS bigint) AS orderdate_epoch,
           o.o_totalprice,
           {osum('l.l_quantity')} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY 1, 2, 3, 4, 5
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume-order report: the IN-over-HAVING shape
    — a grouped aggregate produces the qualifying key set, which then
    semi-joins the fact before a second grouped aggregate.

    Scale shape: the HAVING aggregate shuffles lineitem on l_orderkey
    once; the qualifying set is small (high threshold) and semi-joins
    orders without materializing a distinct step; the final aggregate
    reuses the l_orderkey shuffle partitioning for its (custkey, orderkey)
    group via AQE. Decimal-exact quantity sums keep the >250 threshold
    tie-free across partitionings."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("q"))
        .filter(F.col("q") > 250)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        o.join(
            F.broadcast(big),
            F.col("o_orderkey") == F.col("big_orderkey"),
            "left_semi",
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            epoch_seconds("o_orderdate").alias("orderdate_epoch"),
            "o_totalprice",
        )
        .agg(dsum("l_quantity").alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# CDC merge (MERGE INTO semantics): apply a change batch to a snapshot

CDC_UPD_MOD, CDC_DEL_MOD = 3, 7  # deterministic change-batch partition


@register(
    "customer_cdc_merge",
    oracle=f"""
    WITH snap AS (
      SELECT c_custkey,
             cast(cast(c_acctbal AS decimal(38,6)) * 100 AS bigint)
               AS bal_cents,
             c_nationkey
      FROM customer
    ),
    upd AS (
      SELECT o_custkey AS c_custkey,
             cast(sum(cast(o_totalprice AS decimal(38,6)) * 100)
                  % 10000 AS bigint) AS delta_cents
      FROM orders WHERE o_custkey % 3 = 0 GROUP BY 1
    ),
    ins AS (
      SELECT cast((SELECT max(c_custkey) FROM snap) + n_nationkey + 1
                  AS bigint) AS c_custkey,
             cast(n_nationkey * 1000 AS bigint) AS bal_cents
      FROM nation
    ),
    merged AS (
      SELECT s.c_custkey,
             s.bal_cents + coalesce(u.delta_cents, 0) AS bal_cents,
             CASE WHEN u.c_custkey IS NOT NULL
                  THEN 'updated' ELSE 'kept' END AS src
      FROM snap s LEFT JOIN upd u ON u.c_custkey = s.c_custkey
      WHERE NOT (u.c_custkey IS NULL AND s.c_custkey % 7 = 0)
      UNION ALL
      SELECT c_custkey, bal_cents, 'inserted' AS src FROM ins
    )
    SELECT c_custkey, cast(bal_cents AS bigint) AS bal_cents, src
    FROM merged
    """,
    doc="MERGE INTO-shaped CDC application: update/delete/insert in one pass",
)
def customer_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture application — the lakehouse ``MERGE INTO``
    shape (Delta/Iceberg upsert), expressed as the join Spark actually
    executes underneath: a deterministic change batch (derived from
    orders so both engines synthesize the identical changes — WHEN
    MATCHED THEN UPDATE balance += order-volume delta for custkey%3==0;
    WHEN NOT MATCHED BY SOURCE AND custkey%7==0 THEN DELETE; WHEN NOT
    MATCHED THEN INSERT one seeded row per nation — rules chosen so all
    four outcomes are populated on the fixture) is applied to the customer snapshot in ONE
    pass: snapshot LEFT JOIN changes -> anti-delete filter -> update
    projection -> union inserts. Money stays in exact integer cents
    (the decimal(38,6)-sum rule).

    Scale shape: one hash equi-join on the merge key (at 100 TB both
    sides bucket on the key — `io/bucketed.py` — making the merge
    exchange-free, which is exactly how table formats lay out MERGE
    targets), a map-only filter/projection, and a union with the tiny
    insert set. No window, nothing global. Snapshot versioning/time
    travel is the sink side: `io/writers.py`'s partitioned overwrite
    writes the merged snapshot as the next version directory."""
    snap = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_acctbal").cast("decimal(38,6)") * 100)
        .cast("bigint")
        .alias("bal_cents"),
    )
    upd = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 3 == 0)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            (
                F.sum(F.col("o_totalprice").cast("decimal(38,6)") * 100)
                % 10000
            )
            .cast("bigint")
            .alias("delta_cents")
        )
    )
    from ..io.stats import table_stats

    maxkey = table_stats(spark, sf_dir, "customer")["max_custkey"]
    ins = load_table(spark, sf_dir, "nation").select(
        (F.lit(maxkey) + F.col("n_nationkey") + 1)
        .cast("bigint")
        .alias("c_custkey"),
        (F.col("n_nationkey") * 1000).cast("bigint").alias("bal_cents"),
        F.lit("inserted").alias("src"),
    )
    merged = (
        snap.join(upd, "c_custkey", "left")
        .filter(
            ~(
                F.col("delta_cents").isNull()
                & (F.col("c_custkey") % 7 == 0)
            )
        )
        .select(
            "c_custkey",
            (
                F.col("bal_cents") + F.coalesce("delta_cents", F.lit(0))
            ).alias("bal_cents"),
            F.when(F.col("delta_cents").isNotNull(), F.lit("updated"))
            .otherwise(F.lit("kept"))
            .alias("src"),
        )
    )
    return merged.unionByName(ins)
