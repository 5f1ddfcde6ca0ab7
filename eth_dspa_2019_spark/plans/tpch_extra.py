"""The TPC-H shapes beyond `plans/relational.py`'s core — closing the
documented COVERAGE.md gap ("Q12/Q19/Q21 need l_shipmode / l_commitdate /
l_receiptdate; Q2/Q9/Q11/Q20 need partsupp").

The driver testdata lacks those columns/tables, so this module DERIVES
them deterministically from columns both engines share, with identical
integer arithmetic on BIGINT keys (md5-free: plain modular formulas are
already engine-identical and cheaper):

- ``l_shipmode``   = SHIPMODES[(l_orderkey·3 + l_linenumber) mod 7]
- ``l_commitdate`` = l_shipdate + ((l_orderkey·3 + l_linenumber) mod 61 − 30) days
- ``l_receiptdate``= l_shipdate + ((l_orderkey·5 + l_linenumber) mod 30 + 1) days
- ``partsupp``     = part × k∈{0..3}: ps_suppkey = (p_partkey·7 + k·13) mod S
  (S = |supplier|, keys are 0-based), ps_availqty and integer-cents
  ps_supplycost_c from further modular formulas.

Both the Spark plan and the DuckDB oracle evaluate the SAME formulas over
the SAME inputs, so the correctness contract is untouched — what is
exercised is the QUERY SHAPE: conditional aggregation over a fact join
(Q12), disjunctive multi-branch predicates (Q19), the multi-supplier
wait-chain semi/anti composition (Q21), correlated-min supplier selection
(Q2), multi-way profit rollup (Q9), group-HAVING against a global scalar
(Q11), nested existence pruning (Q20), plus the underived Q8/Q13/Q15/Q17.

Money follows the house rule (`functions/numeric`): per-row double
arithmetic (IEEE-identical in both engines), order-independent
decimal(38,6) sums. Quantities are integral doubles in the testdata and
are cast to BIGINT where compared exactly; supplycost is kept in integer
CENTS so Q11's HAVING-vs-global-scalar is integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum, oavg, osum
from ..io.readers import load_table
from .registry import register

SHIPMODES = ("MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "FOB", "REG AIR")

_O_MODES = "['" + "','".join(SHIPMODES) + "']"
_O_MODE = (
    f"({_O_MODES})[cast((l_orderkey*3 + l_linenumber) % 7 AS int) + 1]"
)
_O_COMMIT = (
    "cast(l_shipdate AS date)"
    " + cast((l_orderkey*3 + l_linenumber) % 61 - 30 AS int)"
)
_O_RECEIPT = (
    "cast(l_shipdate AS date)"
    " + cast((l_orderkey*5 + l_linenumber) % 30 + 1 AS int)"
)


def _mode() -> F.Column:
    idx = (F.col("l_orderkey") * 3 + F.col("l_linenumber")) % 7
    return F.element_at(
        F.array(*[F.lit(m) for m in SHIPMODES]), (idx + 1).cast("int")
    )


def _commitdate() -> F.Column:
    lag = ((F.col("l_orderkey") * 3 + F.col("l_linenumber")) % 61 - 30)
    return F.date_add(F.to_date("l_shipdate"), lag.cast("int"))


def _receiptdate() -> F.Column:
    lag = ((F.col("l_orderkey") * 5 + F.col("l_linenumber")) % 30 + 1)
    return F.date_add(F.to_date("l_shipdate"), lag.cast("int"))


def _lineitem_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").withColumns(
        {
            "l_shipmode": _mode(),
            "l_commitdate": _commitdate(),
            "l_receiptdate": _receiptdate(),
        }
    )


# partsupp synthesis: 4 supplier rows per part. The supplier count is one
# catalog-scale scalar (collected driver-side — metadata, not data).
_O_PARTSUPP = """
      SELECT ps_partkey, ps_suppkey,
             (ps_partkey*31 + ps_suppkey*17) % 9999 + 1 AS ps_availqty,
             (ps_partkey*13 + ps_suppkey*7) % 100000 + 100 AS ps_supplycost_c
      FROM (
        SELECT p_partkey AS ps_partkey,
               (p_partkey*7 + t.k*13) % (SELECT count(*) FROM supplier)
                 AS ps_suppkey
        FROM part CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) t
      )
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..io.stats import table_stats

    n_supp = table_stats(spark, sf_dir, "supplier")["n"]
    part = load_table(spark, sf_dir, "part")
    base = part.select(
        F.col("p_partkey").alias("ps_partkey"),
        F.explode(F.array(*[F.lit(k) for k in range(4)])).alias("k"),
    ).select(
        "ps_partkey",
        ((F.col("ps_partkey") * 7 + F.col("k") * 13) % n_supp).alias(
            "ps_suppkey"
        ),
    )
    return base.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1)
        .alias("ps_availqty"),
        ((F.col("ps_partkey") * 13 + F.col("ps_suppkey") * 7) % 100000 + 100)
        .alias("ps_supplycost_c"),
    )


# ---------------------------------------------------------------------------
# Underived classics


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH co AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '5-LOW'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM co GROUP BY 1
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customer order-count distribution — the left-join +
    double aggregation shape (customers with zero orders must survive
    into the c_count=0 bucket; the priority exclusion stands in for the
    spec's comment-pattern filter). Scale: both aggregations partial
    map-side; the join key is the customer key, dims broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    co = (
        cust.join(orders, orders.o_custkey == cust.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             {osum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: top supplier by quarterly revenue — aggregate, take the
    global max (one scalar), select the achiever(s). Spark form: the max
    is a 1-row broadcast joined back (never a sort of the whole relation);
    ties all surface, exactly like the spec's view form."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mr"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.mr)
        .join(supp, supp.s_suppkey == rev.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qlim
      FROM lineitem GROUP BY 1
    )
    SELECT cast(sum(cast(l.l_extendedprice AS decimal(38,6))) / 7.0
                AS double) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pavg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND p.p_size <= 5
      AND l.l_quantity < a.qlim
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue impact of small-quantity orders — the
    correlated per-part average rewritten as a grouped aggregate joined
    back (Catalyst's own decorrelation shape). The brand/size filter
    stands in for the spec's brand/container pair. Scale: the per-part
    average is a partial-aggregated groupBy on the join key; the part
    dim broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5)
    )
    pavg = li.groupBy("l_partkey").agg(
        (0.2 * F.avg("l_quantity")).alias("qlim")
    )
    j = (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(pavg, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qlim"))
    )
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(38,6)")) / 7.0)
        .cast("double")
        .alias("avg_yearly")
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT cast(year(o.o_orderdate) AS bigint) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           cast({osum("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END")}
                / {osum('volume')} AS double) AS mkt_share
    FROM vol GROUP BY 1
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share inside a region — the widest dim
    constellation in the suite (lineitem ⋈ orders ⋈ customer ⋈ 2×nation ⋈
    region ⋈ supplier ⋈ part) with a conditional-share aggregate. Scale:
    every dim broadcasts; lineitem is the only shuffled relation and only
    for the final year rollup; share numerator/denominator are one
    conditional-sum pair, not two scans."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    nc = nat.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    ns = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(nc, F.col("c_nk") == cust.c_nationkey)
        .join(reg, reg.r_regionkey == F.col("c_rk"))
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(ns, F.col("s_nk") == supp.s_nationkey)
        .join(part, part.p_partkey == li.l_partkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "volume"
            ),
            "supp_nation",
        )
    )
    return vol.groupBy("o_year").agg(
        (
            dsum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("volume"))
                .otherwise(0.0)
            )
            / dsum("volume")
        )
        .cast("double")
        .alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Derived-column classics (shipmode / commitdate / receiptdate)


@register(
    "q12_shipmode_priority",
    oracle=f"""
    WITH l AS (
      SELECT l_orderkey,
             {_O_MODE} AS l_shipmode,
             {_O_COMMIT} AS l_commitdate,
             {_O_RECEIPT} AS l_receiptdate,
             cast(l_shipdate AS date) AS sd
      FROM lineitem
    )
    SELECT l.l_shipmode,
           cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
           cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS bigint) AS low_line_count
    FROM l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipmode IN ('MAIL', 'SHIP')
      AND l.l_commitdate < l.l_receiptdate
      AND l.sd < l.l_commitdate
      AND l.l_receiptdate >= DATE '1996-01-01'
      AND l.l_receiptdate < DATE '1997-01-01'
    GROUP BY 1
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: late-shipment priority counts per ship mode — the
    conditional-aggregation-over-fact-join shape, on the DERIVED
    shipmode/commitdate/receiptdate columns (module docstring). Scale:
    mode + date predicates are all computable in the scan projection
    (no shuffle before the filter); orders joins on the order key; the
    two priority counts are one conditional-sum pair."""
    li = _lineitem_derived(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = (
        li.filter(
            F.col("l_shipmode").isin("MAIL", "SHIP")
            & (F.col("l_commitdate") < F.col("l_receiptdate"))
            & (F.to_date("l_shipdate") < F.col("l_commitdate"))
            & (F.col("l_receiptdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_receiptdate") < F.lit("1997-01-01").cast("date"))
        )
        .join(orders, orders.o_orderkey == li.l_orderkey)
    )
    return j.groupBy("l_shipmode").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    WITH l AS (
      SELECT l_partkey, l_quantity, l_extendedprice, l_discount,
             {_O_MODE} AS l_shipmode
      FROM lineitem
    )
    SELECT {osum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipmode IN ('AIR', 'REG AIR')
      AND ((p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
            AND l.l_quantity BETWEEN 1 AND 11)
        OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 15
            AND l.l_quantity BETWEEN 10 AND 20)
        OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 20
            AND l.l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue under a 3-branch disjunctive predicate — the
    shape that exercises OR-predicate handling across a join (each branch
    constrains both sides). The spec's container/shipinstruct columns are
    stood in by size ranges and the derived shipmode. Scale: the common
    conjunct (shipmode) prunes lineitem in the scan; the disjunction is
    evaluated post-join on broadcast part columns — never a union of
    three scans."""
    li = _lineitem_derived(spark, sf_dir)
    part = load_table(spark, sf_dir, "part")
    b = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    j = (
        li.filter(F.col("l_shipmode").isin("AIR", "REG AIR"))
        .join(part, part.p_partkey == li.l_partkey)
        .filter(
            b("Brand#1", 10, 1, 11)
            | b("Brand#2", 15, 10, 20)
            | b("Brand#3", 20, 20, 30)
        )
    )
    return j.agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


@register(
    "q21_suppliers_kept_waiting",
    oracle=f"""
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN {_O_RECEIPT} > {_O_COMMIT} THEN 1 ELSE 0 END AS late
      FROM lineitem
    ),
    o AS (
      SELECT l.l_orderkey, l.l_suppkey, max(l.late) AS supp_late
      FROM l JOIN orders ord ON ord.o_orderkey = l.l_orderkey
      WHERE ord.o_orderstatus = 'F'
      GROUP BY 1, 2
    ),
    stats AS (
      SELECT l_orderkey,
             count(*) AS n_supp,
             sum(supp_late) AS n_late
      FROM o GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM o
    JOIN stats t ON t.l_orderkey = o.l_orderkey
    JOIN supplier s ON s.s_suppkey = o.l_suppkey
    WHERE o.supp_late = 1 AND t.n_supp >= 2 AND t.n_late = 1
    GROUP BY 1
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who alone held up a multi-supplier order —
    the EXISTS(other supplier) ∧ NOT EXISTS(other late supplier)
    composition, decorrelated into one per-(order, supplier) lateness
    rollup plus a per-order stats join (the rewrite Catalyst cannot do
    from the correlated form; both engines run the identical decorrelated
    plan so the oracle contract is trivial). Late = derived receiptdate
    after derived commitdate; order status 'F' as in the spec. Scale: two
    keyed aggregations and two broadcast-able joins — no correlated
    re-execution per order, no cartesian anywhere."""
    li = _lineitem_derived(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    per_os = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_receiptdate") > F.col("l_commitdate"), 1
                ).otherwise(0)
            ).alias("supp_late")
        )
    )
    stats = per_os.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("supp_late").alias("n_late"),
    )
    return (
        per_os.filter(F.col("supp_late") == 1)
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(supp, supp.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# partsupp-based classics (synthesized standing table — module docstring)


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH partsupp AS ({_O_PARTSUPP}),
    eu AS (
      SELECT ps.ps_partkey, ps.ps_suppkey, ps.ps_supplycost_c,
             s.s_acctbal, s.s_name, n.n_name
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    mn AS (
      SELECT ps_partkey, min(ps_supplycost_c) AS min_c
      FROM eu GROUP BY 1
    )
    SELECT e.s_acctbal, e.s_name, e.n_name,
           e.ps_partkey AS p_partkey, p.p_type,
           e.ps_supplycost_c
    FROM eu e
    JOIN mn ON mn.ps_partkey = e.ps_partkey
           AND mn.min_c = e.ps_supplycost_c
    JOIN part p ON p.p_partkey = e.ps_partkey
    WHERE p.p_size <= 3 AND p.p_type = 'SMALL'
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: the minimum-cost supplier per part within a region —
    the correlated-MIN-subquery shape, decorrelated as a per-part min
    aggregate joined back on (partkey, cost) equality; ties all surface
    as in the spec. Scale: the region-filtered partsupp relation is
    grouped once on its own join key; supplier/nation/region/part all
    broadcast; cost is integer cents so the min-equality join is exact."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 3) & (F.col("p_type") == "SMALL")
    )
    eu = (
        ps.join(supp, supp.s_suppkey == ps.ps_suppkey)
        .join(nat, nat.n_nationkey == supp.s_nationkey)
        .join(reg, reg.r_regionkey == nat.n_regionkey)
        .select(
            "ps_partkey", "ps_suppkey", "ps_supplycost_c",
            "s_acctbal", "s_name", "n_name",
        )
    )
    mn = eu.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost_c").alias("min_c")
    )
    return (
        eu.join(
            mn,
            (F.col("mk") == F.col("ps_partkey"))
            & (F.col("min_c") == F.col("ps_supplycost_c")),
        )
        .drop("mk", "min_c")
        .join(part, F.col("p_partkey") == F.col("ps_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_type",
            "ps_supplycost_c",
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
    WITH partsupp AS ({_O_PARTSUPP})
    SELECT n.n_name AS nation,
           cast(year(o.o_orderdate) AS bigint) AS o_year,
           {osum('l.l_extendedprice * (1 - l.l_discount)'
                 ' - (ps.ps_supplycost_c / 100.0) * l.l_quantity')}
             AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                    AND ps.ps_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: product-line profit by nation and year — the widest
    fact⋈fact shape here (lineitem ⋈ partsupp on the composite
    (part, supp) key) plus four broadcast dims. Profit per row is plain
    double arithmetic (IEEE-identical in both engines); the rollup is an
    order-independent decimal sum. Not every (l_partkey, l_suppkey) hits
    the synthesized partsupp — the inner join keeps the matching subset,
    same relation in both engines. Scale: partsupp is the smaller fact;
    at real scale both sides would be bucketed on (partkey, suppkey)
    (`io/bucketed.py`) making this join exchange-free."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    ps = _partsupp(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    nat = load_table(spark, sf_dir, "nation")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - (F.col("ps_supplycost_c") / 100.0) * F.col("l_quantity")
    )
    j = (
        li.join(part, part.p_partkey == li.l_partkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(
            ps,
            (ps.ps_partkey == li.l_partkey)
            & (ps.ps_suppkey == li.l_suppkey),
        )
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(nat, nat.n_nationkey == supp.s_nationkey)
    )
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("bigint").alias("o_year"),
    ).agg(dsum(profit).alias("sum_profit"))


@register(
    "q11_important_stock",
    oracle=f"""
    WITH partsupp AS ({_O_PARTSUPP}),
    nps AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_c * ps.ps_availqty AS value_c
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
    )
    SELECT ps_partkey,
           cast(sum(value_c) AS bigint) AS value_c
    FROM nps
    GROUP BY 1
    HAVING sum(value_c) * 1000 > (SELECT sum(value_c) FROM nps) * 5
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts representing a significant share of one nation's
    stock value — the HAVING-against-a-global-scalar shape. All in
    integer cents: the 0.5% threshold is the cross-multiplied integer
    inequality sum·1000 > total·5, exact in both engines (no float
    fraction). Scale: the global total is a 1-row broadcast over the
    already-grouped per-part values — the relation is aggregated once,
    not rescanned."""
    ps = _partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    nps = (
        ps.join(supp, supp.s_suppkey == ps.ps_suppkey)
        .join(nat, nat.n_nationkey == supp.s_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost_c") * F.col("ps_availqty")).alias(
                "value_c"
            ),
        )
    )
    per_part = nps.groupBy("ps_partkey").agg(
        F.sum("value_c").alias("value_c")
    )
    total = per_part.agg(F.sum("value_c").alias("total_c"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c") * 5)
        .select("ps_partkey", "value_c")
    )


@register(
    "q20_excess_stock_suppliers",
    oracle=f"""
    WITH partsupp AS ({_O_PARTSUPP}),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             cast(sum(cast(l_quantity AS bigint)) AS bigint) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    excess AS (
      SELECT DISTINCT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
      JOIN shipped sh ON sh.l_partkey = ps.ps_partkey
                     AND sh.l_suppkey = ps.ps_suppkey
      WHERE p.p_name LIKE 'small%'
        AND ps.ps_availqty * 2 > sh.qty
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN excess e ON e.ps_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_regionkey = 2
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock of a part family — the
    nested-existence shape (supplier ∈ {suppliers with availqty >
    half of what they shipped that year}), decorrelated into a grouped
    shipped-quantity relation joined on the composite key, a DISTINCT
    semi-reduction, and a broadcast back onto supplier. Quantities are
    integral, so the half threshold is the exact integer inequality
    2·availqty > qty. Scale: every join is keyed; the DISTINCT collapses
    map-side; region filter prunes the final dim join."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("small")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty")
    )
    excess = (
        ps.join(part, part.p_partkey == ps.ps_partkey)
        .join(
            shipped,
            (shipped.l_partkey == ps.ps_partkey)
            & (shipped.l_suppkey == ps.ps_suppkey),
        )
        .filter(F.col("ps_availqty") * 2 > F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_regionkey") == 2
    )
    return (
        supp.join(excess, excess.ps_suppkey == supp.s_suppkey)
        .join(nat, nat.n_nationkey == supp.s_nationkey)
        .select("s_name", "n_name")
    )
